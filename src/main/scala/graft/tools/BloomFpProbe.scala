package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 meter: the FALSE-POSITIVE side of the three streaming Bloom
  * flaggers. Their no-false-negative contracts are spec-pinned
  * (StreamingSpec), but what an operator actually staffs is the REVIEW
  * QUEUE the flagger generates — flagged-but-not-truly-matching docs are
  * pure surplus work, and their rate is a property of the Bloom fpp, the
  * probes-per-doc, and the corpus key density that only a measurement
  * reveals (the q89 recall-meter discipline applied to the stream side).
  *
  * Method: split the documents table by doc_id parity — EVEN ids form the
  * corpus/train index, ODD ids play the arriving stream — so a doc never
  * collides with itself and every flag is a genuine cross-doc claim. Each
  * flagger's map-only derivation runs unchanged on the batch frame (the
  * stream twins are stateless column maps, so the flagged set is
  * identical by construction); truth replaces Bloom membership with EXACT
  * set membership via a semi join on the same keys. Reported per flagger:
  * streamed docs, flagged docs, truly-matching flagged docs, the
  * false-negative count (must be 0 — the contract), and
  * fp_rate = (flagged − true) / flagged — the fraction of the review
  * queue that is Bloom noise. Not in the driver contract; numbers land in
  * SCALE.md at both SFs.
  */
object BloomFpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val stream = docs.filter(col("doc_id") % 2 === 1)
    val nStream = stream.count()

    def report(name: String, flagged: DataFrame, trueFlagged: DataFrame): Unit = {
      val f = flagged.select(col("doc_id")).distinct().cache()
      val t = trueFlagged.select(col("doc_id")).distinct().cache()
      val nF = f.count(); val nT = t.count()
      // the contract side: every truly-matching doc must be flagged
      val fn = t.join(f, Seq("doc_id"), "left_anti").count()
      val nTrueAmongFlagged = t.join(f, Seq("doc_id"), "left_semi").count()
      val fpRate = if (nF == 0) 0.0 else (nF - nTrueAmongFlagged).toDouble / nF
      println(f"""{"flagger":"$name","sf":"$sfDir","n_stream":$nStream,""" +
        f""""n_flagged":$nF,"n_true":$nT,"false_neg":$fn,"fp_rate":$fpRate%.4f}""")
      f.unpersist(); t.unpersist()
    }

    // Two capacity arms per flagger: the DEFAULT 2^20-key sizing (what the
    // twins ship with — at test corpora the filter is oversized, so the
    // measured fp rate is the honest ~0 an operator gets when capacity ≥
    // keys), and an UNDERSIZED arm (expected keys pinned far below the
    // true count) that saturates the filter — the 100 TB operating point
    // where filter bytes are the constraint and fpp is what you trade for
    // them. The meter prices that trade as review-queue noise.
    val TightKeys = 256L
    val TightFpp = 0.1

    // 1. near-dup band keys (q31's candidate criterion)
    {
      val ck = graft.queries.DedupOps.minhashBandKeys(corpus)
        .select(explode(col("band_keys")).as("k")).distinct()
      val sk = graft.queries.DedupOps.minhashBandKeys(stream)
        .select(col("doc_id"), explode(col("band_keys")).as("k"))
      val truth = sk.join(ck, Seq("k"), "left_semi")
      report("neardup_band",
        graft.streaming.DocumentStreams.nearDupFlags(stream, corpus), truth)
      report("neardup_band_tight",
        graft.streaming.DocumentStreams.nearDupFlags(stream, corpus,
          expectedBandKeys = TightKeys, fpp = TightFpp), truth)
    }

    // 2. image dHash band keys (q71's candidate criterion)
    {
      val ck = graft.queries.MultimodalOps.dhashBandKeys(corpus)
        .select(explode(col("band_keys")).as("k")).distinct()
      val sk = graft.queries.MultimodalOps.dhashBandKeys(stream)
        .select(col("doc_id"), explode(col("band_keys")).as("k"))
      val truth = sk.join(ck, Seq("k"), "left_semi")
      report("image_dhash_band",
        graft.streaming.DocumentStreams.imageNearDupFlags(stream, corpus), truth)
      report("image_dhash_band_tight",
        graft.streaming.DocumentStreams.imageNearDupFlags(stream, corpus,
          expectedBandKeys = TightKeys, fpp = TightFpp), truth)
    }

    // 3. contamination 4-gram overlap (q51's criterion, minShared = 2):
    // truth counts EXACT distinct-gram hits per doc against the train set
    {
      import graft.functions.TextFunctions.tokens
      import org.apache.spark.sql.graft.TextExpressions.ngram_hashes
      val minShared = 2
      val tg = corpus
        .select(explode(array_distinct(ngram_hashes(tokens("text"), 4))).as("fp"))
        .distinct()
      val sg = stream.select(col("doc_id"),
        explode(array_distinct(ngram_hashes(tokens("text"), 4))).as("fp"))
      val truth = sg.join(tg, Seq("fp"), "left_semi")
        .groupBy("doc_id").count().filter(col("count") >= minShared)
      report("contamination_4gram",
        graft.streaming.DocumentStreams.contaminationFlags(stream, corpus,
          minShared = minShared), truth)
      report("contamination_4gram_tight",
        graft.streaming.DocumentStreams.contaminationFlags(stream, corpus,
          minShared = minShared, expectedGrams = TightKeys, fpp = TightFpp),
        truth)
    }

    spark.stop()
  }
}
