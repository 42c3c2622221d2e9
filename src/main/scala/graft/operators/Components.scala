package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the step between near-dup
  * PAIRS (q21/q31/q39/q46 output) and a deduplicated corpus: pairs form
  * clusters, each cluster keeps one canonical document.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round joins labels across the (symmetrized) edge set
  * and keeps the minimum label seen; convergence when a round changes
  * nothing. Rounds needed = graph diameter — near-dup graphs are
  * overwhelmingly small dense clusters (diameter ≤ 3-4), so the loop
  * converges in a handful of rounds even at corpus scale; `maxIter`
  * bounds the pathological chain. Each round is one shuffle keyed on the
  * node id; intermediate label relations persist for the convergence
  * check and unpersist as soon as the next round materializes.
  *
  * Determinism: min() over labels is order-independent — the fixpoint is
  * the same regardless of execution, so downstream canonical choices are
  * stable.
  */
object Components {

  /** Components of the undirected graph given by `edges` (cols `a`, `b`).
    * Returns (id, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: for each edge src->dst, dst's current component
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Canonicalize a document set against a near-dup pair relation: every
    * cluster keeps its minimum doc_id; documents in no pair keep
    * themselves. Returns the surviving rows of `docs`.
    */
  def canonicalize(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comp = connectedComponents(pairs)
    val canonical = comp.groupBy("component").agg(min(col("id")).as("keep"))
    val drop = comp.join(canonical, "component")
      .filter(col("id") =!= col("keep"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
