package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The q21 capped posting-list relation (fp, ds) persisted per corpus —
  * the inverted shingle index between the shingling pass and the pair
  * stage, and the layer where APPEND-ONLY REFRESH lives: a 100 TB lake
  * ingests deltas, and re-shingling the accumulated corpus per delta is
  * the cost this layout exists to avoid. [[PairGraph]] builds its pair
  * relation from here, so a refreshed postings layout transparently
  * refreshes every pair-graph consumer (q62/q63, SplitAssignment).
  *
  * List semantics (graft.queries.TextOps.postingsFrame): size ≤ DfCap
  * rows carry EXACT sorted membership; size DfCap+1 rows are the
  * "dropped" marker — the canonical −1-fill sentinel
  * (TextOps.markerList), whose SIZE is the entire contract: membership
  * is untracked and the sentinel makes it unreadable by construction.
  * Since appending can only GROW a shingle's df, a dropped shingle never
  * returns. That monotonicity is what makes the delta merge exact:
  *
  *   - old kept + delta members → sorted union; crosses the cap → marker
  *   - old marker + anything → stays a marker
  *   - delta-only shingle → its own (capped) list
  *
  * so refresh([[apply]](v1), delta) ≡ [[apply]](v1 ++ delta) row-for-row
  * — kept lists AND markers content-exact, because both paths emit the
  * same sentinel (DerivedRefreshSpec pins both, including a constructed
  * cap crossing).
  *
  * Stamp semantics: [[refreshed]] writes the SAME stamped path a full
  * rebuild of the new corpus would, so consumers cannot observe which
  * build path produced their layout, staleness rules are unchanged, and
  * the old corpus's layout is reaped by the normal sibling pruning. The
  * append-only assumption (old rows immutable, delta identified by
  * doc_id anti-join) is the caller's contract — an edited old document
  * needs the full rebuild path, which the stamp forces anyway unless the
  * caller explicitly routes through [[refreshed]].
  */
object ShinglePostings {

  /** Bump when the shingle grammar or list encoding changes.
    * v2: marker rows carry the canonical −1 sentinel, not an arbitrary
    * capped subset.
    */
  private val Algo = "v2"

  /** Structural version stamp: the algo version PLUS the semantic
    * constants the layout's contents depend on (the DF cap) PLUS the
    * upstream [[DocFingerprints]] grammar tag the cold build inverts.
    * Downstream layouts ([[PairGraph]], clusters) fold this tag into
    * their own stamps, so a cap or grammar change here re-stamps the
    * whole derivation chain without any hand bump (the r17 ADVICE
    * staleness finding: a manual constant only invalidates when a human
    * remembers it exists).
    */
  private[graft] def versionTag: String =
    s"$Algo.cap${graft.queries.TextOps.DfCap}.${DocFingerprints.versionTag}"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("post", versionTag, dir, Seq(s"$dir/documents.parquet"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    DerivedLayout(spark, layoutPath(dir)) { tmp =>
      // cold build INVERTS the stamped fingerprint layout instead of
      // re-shingling the corpus: the shingle pass runs exactly once per
      // corpus (in DocFingerprints), and this build is explode + capped
      // collect — content-identical to shingling live (postingsFromFps
      // is the shared tail of both paths; marker normalization makes the
      // capped collect order-insensitive)
      graft.queries.TextOps.postingsFromFps(DocFingerprints(spark, dir))
        .write.mode("overwrite").parquet(tmp)
    }

  /** The pure delta merge: old postings + the delta documents' postings →
    * the new corpus's postings (see object scaladoc for the case
    * analysis). Doc-id sets are disjoint by the append-only contract, so
    * the kept-list union is concat + sort.
    */
  private[graft] def refreshFrom(oldPostings: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    val cap = graft.queries.TextOps.DfCap
    val delta = graft.queries.TextOps.postingsFrame(deltaDocs)
      .withColumnRenamed("ds", "dds")
    val merged = oldPostings.join(delta, Seq("fp"), "full_outer")
      .select(col("fp"),
        when(col("dds").isNull, col("ds"))
          .when(col("ds").isNull, col("dds"))
          // an old marker stays a marker regardless of delta members
          .when(size(col("ds")) > cap, col("ds"))
          // disjoint sorted lists: merged membership is concat + sort,
          // re-capped to the marker size when it crosses
          .otherwise(slice(sort_array(concat(col("ds"), col("dds"))),
            1, cap + 1))
          .as("ds"))
    // cap crossings normalize to the SAME canonical sentinel a rebuild
    // emits (TextOps.markerList) — refresh ≡ rebuild content-exactly,
    // and marker membership is unreadable on either path
    merged.withColumn("ds",
      when(size(col("ds")) > cap, graft.queries.TextOps.markerList)
        .otherwise(col("ds")))
  }

  /** Build the NEW corpus dir's stamped postings layout from the OLD
    * corpus dir's layout plus the doc_id-anti-join delta — skipping the
    * re-shingling of every pre-existing document, the dominant cost of a
    * full rebuild. Returns the (stamped) new layout; if it already
    * exists, this is just a read. The append-only caller contract is
    * PROBED ([[DerivedLayout.appendOnly]]): a dropped/rewritten old doc
    * falls back to the cold build over the new corpus's fingerprints.
    */
  def refreshed(spark: SparkSession, newDir: String, oldDir: String): DataFrame =
    DerivedLayout(spark, layoutPath(newDir)) { tmp =>
      val out =
        if (!DerivedLayout.appendOnly(spark, newDir, oldDir, "documents", "doc_id", Seq("text")))
          graft.queries.TextOps.postingsFromFps(DocFingerprints(spark, newDir))
        else {
          val oldDocs = graft.Tables(spark, oldDir, "documents").select("doc_id")
          val delta = graft.Tables(spark, newDir, "documents")
            .join(oldDocs, Seq("doc_id"), "left_anti")
          refreshFrom(apply(spark, oldDir), delta)
        }
      out.write.mode("overwrite").parquet(tmp)
    }
}
