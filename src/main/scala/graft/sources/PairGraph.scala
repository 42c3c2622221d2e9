package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The q21 near-dup pair relation (a, b, inter, na, nb, jaccard ≥ 0.06)
  * materialized once per source corpus and shared by its consumers: q62
  * clusters it, q63 thresholds and canonicalizes it. Before this layout the
  * suite computed the identical relation from scratch in q62, again in q63
  * (~0.6 s each at sf0.1) — a real dedup pipeline materializes the pair
  * graph once and every downstream stage reads it, which is exactly the
  * shape this gives the plans: q62/q63 become clustering over a tiny
  * persisted relation instead of shingle-join + clustering fused.
  *
  * q21 itself still computes the relation live — it IS the pair-graph
  * computation, and its bench entry must keep paying that cost.
  *
  * Scale: the pair relation is bounded by the DfCap'd posting-list
  * expansion (≤ DfCap²/2 pairs per surviving shingle — SCALE.md), orders
  * of magnitude smaller than the corpus; at 100 TB it is the classic
  * intermediate you'd land in the lake between the pair job and the
  * cluster job. Stamping/atomicity/reaping are [[DerivedLayout]]'s.
  */
object PairGraph {

  /** Bump when [[graft.queries.TextOps.pairsFromPostings]] itself changes
    * behavior. v2: builds from the [[ShinglePostings]] layout (identical
    * values; the postings layer is where append-only refresh lives).
    */
  private val Algo = "v2"

  /** Structural version stamp: the pair-expansion algo version, the
    * jaccard floor, and the FULL upstream [[ShinglePostings]] tag — so a
    * shingle-grammar or DfCap change two layers up re-stamps this layout
    * (and, transitively, the cluster labels) with no hand bump. The
    * `upstream`/`floor` parameters exist so LayoutStampSpec can prove the
    * invalidation is structural; production callers use the defaults.
    */
  private[graft] def versionTag(
      upstream: String = ShinglePostings.versionTag,
      floor: Double = graft.queries.TextOps.PairJaccardFloor): String =
    s"$Algo.j$floor.$upstream"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("pairs", versionTag(), dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      // build from the persisted postings (shingling happens ONCE per
      // corpus, in the postings layout — and a postings layout produced
      // by ShinglePostings.refreshed feeds this identically)
      import org.apache.spark.sql.functions.{col, size}
      graft.queries.TextOps.pairsFromPostings(
          ShinglePostings(spark, dir)
            .filter(size(col("ds")) <= graft.queries.TextOps.DfCap))
        .write.mode("overwrite").parquet(tmp)
    }
}
