package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Each document's DISTINCT word-bigram shingle fingerprints
  * (doc_id, fps: sorted array<long>), materialized once per corpus — the
  * shingling pass itself, stamped. This is the layer BELOW
  * [[ShinglePostings]]: the postings layout is the inverted (fp → docs)
  * view with the DF cap applied, and since the cap makes hot-shingle
  * membership untracked by design (the −1 marker contract), the
  * per-document fingerprint SETS cannot be reconstructed from it — yet
  * the exact-Jaccard verifiers need them (q100/q107's per-candidate
  * intersects, which must see every shingle including corpus-common
  * ones). Before this layout q100 and q107 each re-shingled the whole
  * corpus per query; the postings cold build shingled it a third time.
  * Now the pass runs once: this layout lands at ingest, the postings
  * build inverts it, and the calibration meters scan it.
  *
  * Docs with NO bigram shingle (0/1-token text) are absent — the q100
  * degenerate-input rule shared by both engines (DuckDB's unnest path
  * never produces such docs), so consumers read the layout bare, no
  * re-filter.
  *
  * Scale: one row per document, ~|distinct bigrams| longs per row —
  * the corpus-proportional "fingerprint column" a production dedup
  * pipeline materializes next to the text. Append-only refresh is the
  * trivial one: doc sets are disjoint, so refresh = old rows ∪ delta
  * rows ([[refreshFrom]]), content-identical to a rebuild.
  *
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s.
  */
object DocFingerprints {

  /** Bump when the shingle grammar (native `shingle_hashes`) changes.
    * Folded into [[ShinglePostings.versionTag]] and transitively the
    * whole pair/cluster chain — a grammar change re-stamps everything.
    */
  private[graft] val versionTag = "fp1"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("docfps", versionTag, dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      fpsFrame(graft.Tables(spark, dir, "documents"))
        .write.mode("overwrite").parquet(tmp)
    }

  /** The defining computation: sorted distinct shingle fingerprints per
    * doc, empty-set docs dropped. Explicit-width spread before the
    * shingle pass (the q67/q51 parallelism pin — the corpus can scan as
    * one split at small SF).
    */
  private[graft] def fpsFrame(docs: DataFrame): DataFrame =
    docs
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .select(col("doc_id"), sort_array(array_distinct(
        org.apache.spark.sql.graft.TextExpressions
          .shingle_hashes(graft.functions.TextFunctions.tokens("text")))).as("fps"))
      .filter(size(col("fps")) > 0)

  /** Append-only delta merge: doc-id sets are disjoint by the caller's
    * contract, so the merged layout is a plain union — exact by
    * construction (each row is a per-doc fact, never cross-doc).
    */
  private[graft] def refreshFrom(oldFps: DataFrame, deltaDocs: DataFrame): DataFrame =
    oldFps.unionAll(fpsFrame(deltaDocs))

  /** Build the NEW corpus dir's stamped layout from the OLD dir's plus
    * the doc_id-anti-join delta — the [[ShinglePostings.refreshed]]
    * discipline: same stamped path a rebuild would land, consumers
    * cannot tell which path ran. The append-only precondition is PROBED
    * ([[DerivedLayout.appendOnly]]): a dropped/rewritten old doc would
    * leave its ghost fingerprints in the union, so that case falls back
    * to the full rebuild (DerivedRefreshSpec's dropped-doc case).
    */
  def refreshed(spark: SparkSession, newDir: String, oldDir: String): DataFrame =
    DerivedLayout(spark, layoutPath(newDir)) { tmp =>
      val out =
        if (!DerivedLayout.appendOnly(spark, newDir, oldDir, "documents", "doc_id", Seq("text")))
          fpsFrame(graft.Tables(spark, newDir, "documents"))
        else {
          val oldDocs = graft.Tables(spark, oldDir, "documents").select("doc_id")
          val delta = graft.Tables(spark, newDir, "documents")
            .join(oldDocs, Seq("doc_id"), "left_anti")
          refreshFrom(apply(spark, oldDir), delta)
        }
      out.write.mode("overwrite").parquet(tmp)
    }
}
