package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The near-dup CLUSTER LABELS (doc_id, cluster_full, cluster_strong)
  * materialized once per source corpus — the layer between the
  * [[PairGraph]] pair relation and every consumer that needs components
  * rather than pairs. Before this layout q62, q63, q101 and the
  * SplitAssignment build each re-ran pointer-jumped connected components
  * ([[graft.operators.Components]]) over PairGraph at query time — the
  * suite's three slowest Spark rows (1.4/1.1/1.0 s, 25 jobs for q101 at
  * sf0.1) were all that recomputation. A production dedup pipeline runs
  * the cluster job ONCE per corpus and lands the labels next to the pair
  * graph; every downstream stage (canonicalization, split assignment,
  * ROI accounting) is then a scan plus small joins, which is exactly the
  * shape this gives the plans — the [[SplitAssignment]] precedent (its
  * consumers went 25/29/31 jobs → 3/8/9) applied one layer down.
  *
  * Two label columns because the suite deliberately exposes BOTH graphs:
  * `cluster_full` labels components of the full PairGraph (jaccard ≥
  * 0.06 — q62's raw transitive structure readout), `cluster_strong`
  * labels components of the jaccard ≥ [[StrongJaccard]] slice (the
  * deliverable threshold q63/q68/q101 canonicalize at; null for a doc in
  * no strong pair). Strong components refine full components, but the
  * labels are independent fixpoints, so both are stored.
  *
  * The stored values are EXACTLY what the inline computation produced —
  * min-label CC has a unique fixpoint (component minimum), longs
  * round-trip parquet bit-for-bit — so every oracle comparison is
  * unchanged; ClusterAssignmentSpec pins layout ≡ inline row by row.
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s; the stamp keys on
  * documents.parquet so a regenerated corpus invalidates the layout.
  *
  * Scale: |docs-in-any-pair| rows of three longs — bounded by the
  * DfCap'd pair relation's node set, orders of magnitude smaller than
  * the corpus. A cold build is PairGraph (itself stamped, built from the
  * postings layout) + two O(log diameter) CC runs; every later consumer
  * is a parquet scan.
  */
object ClusterAssignment {

  /** The canonicalization threshold shared by q63/q68/q98/q101 — ONE
    * definition of "strong near-dup" across the suite (see q63's
    * threshold-hygiene note: clustering the full 0.06 graph chains 498
    * of 500 docs into one component; the deliverable thresholds first).
    */
  val StrongJaccard = 0.5

  /** Bump when [[graft.operators.Components.connectedComponents]] itself
    * changes behavior (the min-label CC algorithm).
    */
  private val Algo = "cc1"

  /** Structural version stamp: the CC algo version, the strong-slice
    * threshold, and the FULL upstream [[PairGraph]] tag — which itself
    * folds in the jaccard floor and ShinglePostings' grammar/cap tag. A
    * semantic change ANYWHERE in the derivation chain (DfCap, shingle
    * grammar, pair floor, strong threshold, CC algo) therefore mints a
    * fresh layout path with no hand bump — the r17 ADVICE fix: the old
    * manual `Version = "v1"` served stale labels if PairGraph's
    * semantics changed without a human remembering to bump it here. The
    * parameters exist so LayoutStampSpec can prove the invalidation is
    * structural; production callers use the defaults.
    */
  private[graft] def versionTag(
      upstream: String = PairGraph.versionTag(),
      strong: Double = StrongJaccard): String =
    s"$Algo.s$strong.$upstream"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("clusters", versionTag(), dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      inlineFrame(spark, dir).write.mode("overwrite").parquet(tmp)
    }

  /** The layout's defining computation, also the spec's reference: CC
    * over the full pair graph left-joined with CC over the strong slice.
    */
  private[graft] def inlineFrame(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PairGraph(spark, dir)
    val full = graft.operators.Components
      .connectedComponents(pairs.select("a", "b"))
      .select(col("id").as("doc_id"), col("component").as("cluster_full"))
    val strong = graft.operators.Components
      .connectedComponents(
        pairs.filter(col("jaccard") >= StrongJaccard).select("a", "b"))
      .select(col("id").as("doc_id"), col("component").as("cluster_strong"))
    full.join(strong, Seq("doc_id"), "left")
  }

  /** The strong-slice labels as (id, component) — the shape
    * [[graft.operators.Components.connectedComponents]] returns, for
    * consumers written against it (q63's drop set, q68's gate, q101's
    * histogram).
    */
  def strongComponents(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir)
      .filter(col("cluster_strong").isNotNull)
      .select(col("doc_id").as("id"), col("cluster_strong").as("component"))
}
