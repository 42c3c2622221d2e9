package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The repeated 8-token-span statistics (span, n_occ, n_docs), n_occ ≥ 2,
  * materialized once per corpus — q105's rollup, stamped at ingest so the
  * boilerplate audit is a vocab-sized scan + TakeOrdered head instead of
  * a per-query corpus explode (the TermStats discipline applied to the
  * span family). [[graft.queries.TextOps.spanStatsFrame]] is the ONE
  * defining computation; the ≥2 gate is part of the relation's identity
  * (see its scaladoc), which is also why this layout REBUILDS on refresh
  * rather than delta-merging: a span at n_occ=1 in the old corpus was
  * dropped, so a delta occurrence lifting it to 2 is invisible to any
  * merge over the stored rows. The append path for span statistics at
  * hostile cardinality is the count-min sketch family (q61) — bounded
  * memory, same top-k contract — which is why both forms exist.
  *
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s.
  */
object SpanStats {

  /** Bump when the span arity, run-length rollup, or the ≥2 gate change. */
  private[graft] val versionTag = "sp1.n8.min2"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("spans", versionTag, dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      graft.queries.TextOps.spanStatsFrame(graft.Tables(spark, dir, "documents"))
        .write.mode("overwrite").parquet(tmp)
    }
}
