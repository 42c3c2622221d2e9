package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the step between near-dup
  * PAIRS (q21/q31/q39/q46 output) and a deduplicated corpus: pairs form
  * clusters, each cluster keeps one canonical document. q62 exposes it
  * oracle-checked against a recursive transitive-closure CTE.
  *
  * Algorithm: min-label propagation WITH pointer jumping (path halving).
  * Every node starts labeled with itself; each round (a) takes the min
  * label across the symmetrized edge set, then (b) relabels through the
  * label's own label — lbl' = lbl(lbl) — so chain length halves per round
  * and convergence needs O(log diameter) rounds, not O(diameter). That
  * matters beyond adversarial inputs: a low-jaccard near-dup graph is NOT
  * all tight cliques — measured at sf0.01/threshold 0.06 the q21 pair
  * graph carries long similarity chains that plain propagation walks for
  * tens of rounds. The round budget is fail-loud: silently returning
  * unconverged labels (the pre-round-8 behavior at maxIter) is a wrong
  * clustering, not a slow one.
  *
  * Scale shape: each round is a bounded number of shuffles keyed on node
  * id, driven by ONE action — the convergence changed-count, which also
  * materializes the round's LAZY localCheckpoint (O(1) driver state;
  * measured on a 65-node chain: 64 AQE stage-jobs total vs 72 when the
  * checkpoint was eager and the count a second action per round — the
  * ConnectedComponentsSpec job-accounting test pins this). Lazy-vs-eager
  * wall-clock was A/B'd interleaved in one JVM (tools/CcAb, round 10,
  * q62+q63 at sf0.1, 5 reps each, arms alternated within each rep so
  * drift hits both equally): lazy 4.70 s median / 4.09 s min vs eager
  * 4.56 s / 3.96 s — statistically indistinguishable (~3% apart with
  * ~40% within-arm spread as JIT warms), and BOTH arms sit at round 8's
  * ~4.8 s level, so round 9's recorded q62+q63 7.96 s was thermal
  * drift, not the refactor. Lazy is kept: equal wall-clock, strictly
  * fewer scheduler jobs (64 vs 72 on the 65-node chain). Lineage is
  * truncated per round with localCheckpoint — the jump's self-join
  * doubles the LOGICAL plan otherwise and the analyzer, not the
  * executors, becomes the bottleneck (measured: minutes per round by
  * round ~15 with persist alone).
  *
  * Determinism: min() over labels is order-independent — the fixpoint
  * (every node labeled with its component's minimum id) is the same
  * regardless of execution order, so downstream canonical choices are
  * stable.
  */
object Components {

  /** Checkpoint-eagerness knob for the round-10 A/B (tools/CcAb): lazy
    * (false) makes the convergence count the round's single action; eager
    * (true) adds a materialization job per round. Flipped only by the
    * measurement tool — production callers use the default.
    */
  @volatile private[graft] var eagerCheckpoint = false

  /** Components of the undirected graph given by `edges` (cols `a`, `b`).
    * Returns (id, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    connectedComponentsInstrumented(edges, maxRounds)._1

  /** Instrumented twin for the scale probe (tools/CcProbe) and specs: the
    * same single implementation, also returning per-round (changedCount,
    * wallMillis) so rounds-to-converge vs graph scale is measurable
    * instead of asserted — the O(log diameter) claim is a SCALE.md row.
    */
  private[graft] def connectedComponentsInstrumented(edges: DataFrame,
      maxRounds: Int = 50): (DataFrame, Seq[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel
    val roundStats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(eager = eagerCheckpoint) // lazy: materializes inside round 1's job
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      val roundStart = System.nanoTime()
      require(rounds <= maxRounds,
        s"connectedComponents did not converge in $maxRounds rounds")
      // min neighbour label per node (every node has >=1 edge by construction)
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")),
          "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nmin"))
      // the round's OLD label rides along so the convergence check below
      // is a filter on the checkpointed rows, not another join+shuffle
      val hop = labels
        .join(neighborMin, "id")
        .select(col("id"), col("component").as("old"),
          least(col("component"), col("nmin")).as("component"))
      // pointer jump: labels only ever decrease toward the component
      // minimum, so relabeling through lbl(lbl) preserves the fixpoint.
      // hop appears twice in this plan and is recomputed rather than
      // checkpointed — two cheap joins beat an extra materialization
      // barrier per round.
      val next = hop.as("h")
        .join(hop.select(col("id").as("jid"), col("component").as("jc")).as("j"),
          col("h.component") === col("jid"), "left")
        .select(col("h.id").as("id"), col("h.old").as("old"),
          least(col("h.component"), coalesce(col("jc"), col("h.component")))
            .as("component"))
        // LAZY checkpoint: the convergence count below is the round's ONE
        // action — computing it materializes every partition of the
        // checkpointed RDD (count scans all rows), so the round needs no
        // separate eager-materialization job. Lineage still truncates.
        .localCheckpoint(eager = eagerCheckpoint)
      changed = next.filter(col("component") =!= col("old")).count()
      roundStats += ((changed, (System.nanoTime() - roundStart) / 1000000L))
      labels = next.select("id", "component")
    }
    sym.unpersist(blocking = false)
    (labels.select("id", "component"), roundStats.toSeq)
  }

  /** Canonicalize a document set against a near-dup pair relation:
    * documents in no pair keep themselves; each cluster keeps ONE member
    * chosen by the keep policy — its minimum id (`keepScores = None`,
    * provenance-stable: the canonical id never changes as a cluster
    * grows), or the score argmax with ties to the smaller id
    * (`keepScores = Some(frame)` with columns (id, score) — q113's
    * keep-best rule; q113 is the meter that prices the choice, this is
    * the lever it justifies). A keep-best caller must supply a score for
    * every clustered id (near_dedup scores the flowing docs themselves,
    * so the frame is total by construction); an id missing from the
    * score frame would silently survive. Returns the surviving rows of
    * `docs`.
    */
  def canonicalize(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id",
      keepScores: Option[DataFrame] = None): DataFrame = {
    val drop = dropSet(connectedComponents(pairs), keepScores)
    docs.join(drop.select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** The non-canonical member set of a labeled (id, component) relation
    * under a keep policy — shared by [[canonicalize]] (live components)
    * and the layout-consuming queries (stamped ClusterAssignment labels,
    * q63/q114). keep-min is a component-keyed argmin group; keep-best is
    * a row_number window over the labeled slice (tiny: docs-in-pairs
    * rows, never corpus-keyed — q113's plan shape).
    */
  private[graft] def dropSet(comp: DataFrame,
      keepScores: Option[DataFrame]): DataFrame = keepScores match {
    case None =>
      val canonical = comp.groupBy("component").agg(min(col("id")).as("keep"))
      comp.join(canonical, "component")
        .filter(col("id") =!= col("keep"))
        .select(col("id"))
    case Some(sc) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("component")
        .orderBy(col("score").desc, col("id"))
      comp.join(sc, "id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1)
        .select(col("id"))
  }
}
