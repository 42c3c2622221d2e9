package graft.sources

import org.apache.spark.sql.SparkSession

/** The q110 curriculum model as an ingest-stamped artifact — the
  * [[BigramLm]] posture applied to the unigram-LM curriculum family: a
  * production pipeline trains the difficulty scorer (q66's LM dims) and
  * fixes the exact quartile thresholds ONCE when the corpus lands; every
  * phase consumer (batch q110, a curriculum-ordered reader) reads the
  * artifact. Before this layout q110 re-trained the LM and re-derived
  * the three percentiles per query — 15 jobs, the suite's highest (the
  * r18 verdict's remaining job-count finding).
  *
  * The stored row is EXACTLY what inline training produced
  * ([[graft.queries.TextOps.curriculumModel]] is the ONE derivation,
  * shared with the `curriculum_order` stage and the stream twin, which
  * train on their own frames by stage semantics): top-V vocab in
  * (count DESC, word) order, V counts, the corpus total — all exact
  * integers/strings — plus the three interpolated thresholds as doubles
  * (dyadic percentiles over exact longs; parquet round-trips doubles
  * bit-for-bit). CurriculumThresholdsSpec pins layout ≡ inline field for
  * field, and the q110 oracle (which re-derives everything corpus-side)
  * pins the scores end to end.
  *
  * Refresh is REBUILD by documented necessity (the [[BigramLm]] rule):
  * an append can reorder the top-V vocabulary AND moves the quartile
  * boundaries — no merge over the stored row is information-sufficient.
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s; the collected
  * model is memoized per stamped path with [[SessionMemo]] hygiene.
  */
object CurriculumThresholds {

  /** Bump when the model form changes; folds the vocab size and the
    * milli-quantization the thresholds are defined over.
    */
  private[graft] def versionTag: String =
    s"cur1.v${graft.queries.TextOps.PplVocab}.n3"

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("curthr", versionTag, dir,
      Seq(s"$dir/documents.parquet"))

  private val cache = SessionMemo.track(scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.queries.TextOps.CurriculumModel])(_._1)

  /** The corpus's curriculum model, built at ingest and memoized per
    * session.
    */
  private[graft] def model(spark: SparkSession, dir: String)
      : graft.queries.TextOps.CurriculumModel = {
    val target = layoutPath(dir)
    SessionMemo.cachedStamped(cache, spark, target)({
      val df = DerivedLayout(spark, target) { tmp =>
        import spark.implicits._
        val m = graft.queries.TextOps
          .curriculumModel(graft.Tables(spark, dir, "documents"))
        Seq((m.vw, m.vc, m.total, m.p25, m.p50, m.p75))
          .toDF("vw", "vc", "total", "p25", "p50", "p75")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      }
      val r = df.head()
      graft.queries.TextOps.CurriculumModel(r.getSeq[String](0),
        r.getSeq[Long](1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))
    })
  }
}
