package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The repeated content-defined-chunk statistics (chunk, n_occ, n_docs),
  * n_occ ≥ 2, materialized once per corpus — q121's rollup, stamped at
  * ingest so the chunk-dedup audit (q121) and its ROI pricing (q122)
  * are layout scans instead of per-query corpus chunkings (the SpanStats
  * posture applied to the CDC family).
  * [[graft.queries.TextOps.cdcChunkStats]] is the ONE defining
  * computation; the ≥2 gate is part of the relation's identity, which is
  * also why this layout REBUILDS on refresh rather than delta-merging: a
  * chunk at n_occ=1 in the old corpus was dropped, so a delta occurrence
  * lifting it to 2 is invisible to any merge over the stored rows
  * (SpanStats' rationale verbatim — the hostile-cardinality append path
  * is the count-min family, q61).
  *
  * The `boilerplateChunkFlags` stream twin deliberately keeps the
  * frame-based [[graft.queries.TextOps.cdcChunkStats]] form: its corpus
  * argument is a flowing reference frame (stage semantics), not a table
  * dir.
  *
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s.
  */
object ChunkStats {

  /** Bump when the cut divisor, the hash, or the ≥2 gate change. */
  private[graft] val versionTag = "ck1.d8.min2"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("chunks", versionTag, dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      graft.queries.TextOps.cdcChunkStats(graft.Tables(spark, dir, "documents"))
        .write.mode("overwrite").parquet(tmp)
    }
}
