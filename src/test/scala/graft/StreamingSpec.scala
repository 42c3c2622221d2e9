package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming twins agree with their batch formulations on bounded input.
  *
  * Append-mode watermark semantics: windows/sessions not yet closed by the
  * final watermark are withheld at end-of-stream, so the checks are
  * (a) every EMITTED row matches its batch twin exactly, and (b) only rows
  * near the stream's end may be withheld.
  */
class StreamingSpec extends SparkSpec {

  // file stream sources require a directory, not a bare file
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly counts: emitted windows equal batch windows") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    val got = EventStreams.runToMemory(
      EventStreams.hourlyCounts(stream), "hourly_t")
    val batch = queries.EventOps.q22EventsHourly.fn(spark, sf)
      .withColumnRenamed("n", "n_b")
    val joined = got.join(batch, Seq("bucket", "event_type"), "inner")
    // every emitted row has a batch twin with identical count
    assert(joined.count() == got.count())
    assert(joined.filter(col("n") =!= col("n_b")).count() == 0)
    // withheld rows are only those the final watermark hadn't closed
    val maxTs = Tables(spark, sf, "events").agg(max("ts")).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3 * 3600 * 1000L)
    val missing = batch.join(got.select("bucket", "event_type"),
      Seq("bucket", "event_type"), "left_anti")
    assert(missing.filter(col("bucket") < cutoff).count() == 0)
  }

  test("streaming approx-distinct users: sketch equals the batch sketch per window") {
    val m = 1 << 16
    val stream = EventStreams.readEvents(spark, eventsPath)
    val got = EventStreams.runToMemory(
      EventStreams.approxDistinctUsers(stream, m), "approx_users_t")
    // batch twin: identical bucket hash + estimator over the same table
    val p = 2147483647L
    val x = s"(((user_id % $p) * 1103515245 + (user_id div $p) * 12345) % $p)"
    val batch = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(countDistinct(expr(s"($x * $x % $p * 69069) % $p % $m")).as("filled"))
      .select(col("w.start").as("bucket"), col("event_type"),
        floor(lit(-m.toDouble) * log(lit(1.0) - col("filled").cast("double") / m) + 0.5)
          .cast("long").as("approx_b"))
    val joined = got.join(batch, Seq("bucket", "event_type"), "inner")
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("approx_users") =!= col("approx_b")).count() == 0)
  }

  test("streaming approx-distinct users: negative user ids flow (pmod bucket)") {
    // Regression: the bucket hash used SQL %, which keeps the dividend's
    // sign — a negative user_id produced a negative bucket and
    // LinearCountBuckets.update's require(bucket >= 0) ABORTED the whole
    // streaming query. TPC-H ids are positive so the oracle never caught
    // it; the API contract has no such restriction. Long.MinValue is the
    // worst case (|x| has no positive twin).
    import org.apache.spark.sql.Row
    val t0 = java.time.Instant.parse("2026-01-01T00:30:00Z").toEpochMilli
    def nanos(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000000L
    val rows = Seq(
      Row(1L, nanos(0), -1L, "view", 1.0, "{}"),
      Row(2L, nanos(5), Long.MinValue, "view", 1.0, "{}"),
      Row(3L, nanos(10), -777L, "view", 1.0, "{}"),
      Row(4L, nanos(15), 42L, "view", 1.0, "{}"),
      // hour-10 row pushes the final watermark past the hour-0 window
      Row(5L, nanos(600), -1L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("events_negids")
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), EventStreams.rawSchema)
    table.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val m = 1 << 16
    val stream = spark.readStream.schema(EventStreams.rawSchema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val got = EventStreams.runToMemory(
      EventStreams.approxDistinctUsers(stream, m), "approx_neg_t")
    // batch twin with the same pmod bucket over the same rows
    val p = 2147483647L
    val x = s"(((user_id % $p) * 1103515245 + (user_id div $p) * 12345) % $p)"
    val batch = table
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(countDistinct(expr(s"pmod(($x * $x % $p * 69069) % $p, $m)")).as("filled"))
      .select(col("w.start").as("bucket"), col("event_type"),
        floor(lit(-m.toDouble) * log(lit(1.0) - col("filled").cast("double") / m) + 0.5)
          .cast("long").as("approx_b"))
    val joined = got.join(batch, Seq("bucket", "event_type"), "inner")
    assert(got.count() > 0, "hour-0 window was never emitted — query likely aborted")
    assert(joined.count() == got.count())
    assert(joined.filter(col("approx_users") =!= col("approx_b")).count() == 0)
    // the hour-0 window saw 4 distinct users (3 negative, 1 positive)
    assert(got.filter(col("approx_users") === 4).count() >= 1)
  }

  test("streaming sessionization: emitted sessions equal batch sessions") {
    val stream = EventStreams.readEvents(spark, eventsPath)
    val got = EventStreams.runToMemory(
      EventStreams.sessionize(stream), "sessions_t")
    val batch = queries.EventOps.q23Sessionize.fn(spark, sf)
      .withColumnRenamed("n_events", "n_b")
    val joined = got.join(batch, Seq("user_id", "session_start"), "inner")
    assert(joined.count() == got.count())
    assert(joined.filter(col("n_events") =!= col("n_b")).count() == 0)
    assert(got.filter(col("session_start") > col("session_end")).count() == 0)
  }

  test("streaming dedup: duplicated source files collapse to distinct event ids") {
    // a directory holding the SAME parquet twice = every event duplicated
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val got = EventStreams.runToMemory(
      EventStreams.dedupEvents(EventStreams.readEvents(spark, dir.toString)), "dedup_t")
    val n = Tables(spark, sf, "events").count()
    assert(got.count() == n, s"expected $n distinct events")
    assert(got.select("event_id").distinct().count() == n)
  }

  test("streaming as-of enrichment: multi-batch stream-stream join drops late rows") {
    import spark.implicits._
    val dirL = java.nio.file.Files.createTempDirectory("asof_clicks")
    val dirR = java.nio.file.Files.createTempDirectory("asof_purchases")
    def ns(hour: Double): Long = (hour * 3600e9).toLong
    def writeRows(dir: java.nio.file.Path, name: String, mod: Long,
        rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("asof_part")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    // batch 1: on-time clicks + purchases; watermark after = 20:00 − 2 h = 18:00
    writeRows(dirL, "a.parquet", 10000L, Seq(
      (3L, ns(14), 1L, "click", 0.0, "{}"),
      (5L, ns(12), 2L, "click", 0.0, "{}"),
      (6L, ns(20), 2L, "click", 0.0, "{}")))
    writeRows(dirR, "a.parquet", 10000L, Seq(
      (0L, ns(0.5), 1L, "purchase", 1.0, "{}"),
      (2L, ns(13.5), 1L, "purchase", 7.0, "{}"),
      (4L, ns(11.5), 2L, "purchase", 9.0, "{}"),
      (9L, ns(20), 2L, "purchase", 3.0, "{}"),
      (10L, ns(18.5), 1L, "purchase", 4.0, "{}")))
    // batch 2: a late click — 19:00 joins purchase 10 still held in state.
    // State CLEANUP runs at end-of-batch AFTER inputs join (an in-batch
    // late row still sees not-yet-evicted state), so batch 2 is also the
    // first batch whose end evicts purchase 0 (1:30 + 1 h < the 18:00
    // watermark)
    writeRows(dirL, "b.parquet", 20000L, Seq(
      (7L, ns(19), 1L, "click", 0.0, "{}")))
    // batch 3: a VERY late click at 1:00 — its only candidate (purchase 0)
    // was evicted at the end of batch 2, so it emits nothing
    writeRows(dirL, "c.parquet", 30000L, Seq(
      (8L, ns(1), 1L, "click", 0.0, "{}")))
    val left = EventStreams.readEvents(spark, dirL.toString, maxFilesPerTrigger = Some(1))
    val right = EventStreams.readEvents(spark, dirR.toString, maxFilesPerTrigger = Some(1))
    val got = EventStreams.runToMemory(
      EventStreams.enrichAsOf(left, right, horizon = "1 hour"), "asof_t")
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    // per-user candidates within [l.ts − 1 h, l.ts]; user 2's clicks never
    // see user 1's purchases; event 8 emits nothing (its candidate state
    // was evicted — the bounded-state contract late rows pay for)
    assert(got == Set((3L, 2L), (5L, 4L), (6L, 9L), (7L, 10L)))
  }

  test("streaming stratified sample equals the batch q49 subset") {
    import graft.streaming.DocumentStreams
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val got = EventStreams.runToMemory(
      DocumentStreams.stratifiedSample(
        DocumentStreams.readDocuments(spark, dir.toString)), "sample_t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val batch = queries.PipelineOps.q49StratifiedSample.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == batch)
  }

  test("streaming sequence packing carries shard state across micro-batches") {
    import graft.streaming.DocumentStreams
    // split the table into two doc_id-ordered files => two micro-batches;
    // the per-shard running token count must carry across the boundary for
    // the output to equal the batch window formulation
    val docs = Tables(spark, sf, "documents")
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("docs_packing")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("docs_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, docs.filter(col("doc_id") <= mid))
    writePart("b.parquet", 20000L, docs.filter(col("doc_id") > mid))
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val got = EventStreams.runToMemory(
      DocumentStreams.packSequences(stream), "packing_t")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val batch = queries.PipelineOps.q50SequencePacking.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == batch)
  }

  test("streaming near-dup flags: no false negatives vs the exact band join") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    // stream the b-side of known q31 near-dup pairs (so true positives
    // exist) plus a slice of unrelated docs (so true negatives exist)
    val pairs = queries.DedupOps.q31MinhashLsh.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus lost its implanted near-dups")
    val streamIds = (pairs.map(_._2).distinct.take(10) ++
      docs.select("doc_id").collect().map(_.getLong(0))
        .filterNot(id => pairs.exists(p => p._1 == id || p._2 == id)).take(10)).toSet
    val stream = docs.filter(col("doc_id").isin(streamIds.toSeq: _*))
    val corpus = docs.filter(!col("doc_id").isin(streamIds.toSeq: _*))
    // exact expectation: stream docs sharing any (band, bh) with the corpus
    val exact = queries.DedupOps.minhashBands(stream).as("s")
      .join(queries.DedupOps.minhashBands(corpus).as("c"),
        col("s.band") === col("c.band") && col("s.bh") === col("c.bh"))
      .select(col("s.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "expected at least one banded partner in the corpus")
    val dir = java.nio.file.Files.createTempDirectory("docs_neardup")
    stream.write.mode("overwrite").parquet(dir.toString + "/s")
    val flagged = EventStreams.runToMemory(
      DocumentStreams.nearDupFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus), "neardup_t")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"bloom band index missed true near-dup candidates: ${exact -- flagged}")
    // fp sanity: the surplus over exact stays small (4 keys/doc at 1% fpp)
    assert(flagged.size <= exact.size + math.max(3, streamIds.size / 5),
      s"false-positive volume unreasonable: ${flagged.size} vs exact ${exact.size}")
  }

  test("streaming image near-dup flags: no false negatives vs the dhash band join") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    // stream the b-side of known q71 image pairs + unrelated docs
    val pairs = queries.MultimodalOps.q71ImageNeardup.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val streamIds = (pairs.map(_._2).distinct.take(10) ++
      docs.select("doc_id").collect().map(_.getLong(0))
        .filterNot(id => pairs.exists(p => p._1 == id || p._2 == id)).take(10)).toSet
    val stream = docs.filter(col("doc_id").isin(streamIds.toSeq: _*))
    val corpus = docs.filter(!col("doc_id").isin(streamIds.toSeq: _*))
    // exact expectation: stream images sharing any dhash band key with the
    // corpus (q71's candidate criterion)
    val exact = queries.MultimodalOps.dhashBandKeys(stream)
      .select(col("doc_id"), explode(col("band_keys")).as("k")).as("s")
      .join(queries.MultimodalOps.dhashBandKeys(corpus)
        .select(explode(col("band_keys")).as("k")).distinct().as("c"), Seq("k"))
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("docs_imgdup")
    stream.write.mode("overwrite").parquet(dir.toString + "/s")
    val flagged = EventStreams.runToMemory(
      DocumentStreams.imageNearDupFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus), "imgdup_t")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"bloom dhash band index missed candidates: ${exact -- flagged}")
    assert(flagged.size <= exact.size + math.max(3, streamIds.size / 5),
      s"false-positive volume unreasonable: ${flagged.size} vs exact ${exact.size}")
  }

  test("streaming featurization equals batch features row-for-row (both heads)") {
    import graft.streaming.MlStreams
    import scala.jdk.CollectionConverters._
    val emb = Tables(spark, sf, "embeddings")
    val mid = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("emb_feats")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("feats_part")
      part.select("vec_id", "label", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, emb.filter(col("vec_id") <= mid))
    writePart("b.parquet", 20000L, emb.filter(col("vec_id") > mid))
    val stream = spark.readStream.schema(MlStreams.embeddingSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Seq[Float], Seq[Float])] =
      df.collect().map(r =>
        (r.getString(0), r.getSeq[Float](1), r.getSeq[Float](2))).toSet
    // softmax head: a fixed deterministic 3x64 matrix
    val wSm = Array.tabulate(3 * 64)(j =>
      (((j % 64) * 37 + (j / 64) * 17) % 21 - 10) / 10.0)
    val gotSm = rows(EventStreams.runToMemory(
      MlStreams.softmaxFeatures(stream, 64, 3, wSm), "sm_feats_t"))
    val batchSm = rows(new graft.ml.SoftmaxRegression(64, 3)
      .features(emb, "vec_id", "embedding", wSm))
    assert(gotSm == batchSm, "streamed softmax features diverge from batch")
    // binary head over the same stream source
    val wLr = Array.tabulate(64)(i => ((i * 37) % 21 - 10) / 10.0)
    val gotLr = rows(EventStreams.runToMemory(
      MlStreams.features(stream, 64, wLr), "lr_feats_t"))
    val batchLr = rows(new graft.ml.LogisticRegression(64)
      .features(emb, "vec_id", "embedding", wLr))
    assert(gotLr == batchLr, "streamed binary features diverge from batch")
  }

  test("streaming moment cells equal batch q90 after the last micro-batch") {
    import graft.streaming.MlStreams
    import scala.jdk.CollectionConverters._
    val emb = Tables(spark, sf, "embeddings")
    val mid = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("emb_moments")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("mom_part")
      part.select("vec_id", "label", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, emb.filter(col("vec_id") <= mid))
    writePart("b.parquet", 20000L, emb.filter(col("vec_id") > mid))
    val stream = spark.readStream.schema(MlStreams.embeddingSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    // complete-mode state: the final table reflects BOTH micro-batches.
    // The default is the FORCED-WIDE path (Sum128 — the stream side is
    // the one that eventually crosses the long bound, so it escalates
    // unconditionally), compared against batch q90, which at this N runs
    // the narrow long sum: wide streamed ≡ narrow batch is the Sum128Spec
    // equivalence discipline exercised across the batch/stream boundary
    val got = EventStreams.runToMemory(
        MlStreams.momentCells(stream), "moments_t", outputMode = "complete")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val batch = queries.VectorOps.q90EmbeddingMoments.fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == batch,
      s"streamed moment cells diverge: ${(got.keySet -- batch.keySet).take(3)}")
    // the narrow opt-out stays equal too on this bounded replay
    val narrow = EventStreams.runToMemory(
        MlStreams.momentCells(
          spark.readStream.schema(MlStreams.embeddingSchema)
            .option("maxFilesPerTrigger", 1).parquet(dir.toString),
          wide = false),
        "moments_narrow_t", outputMode = "complete")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(narrow == batch, "narrow-path streamed moment cells diverge from batch")
  }

  test("streaming distortion cells equal batch q106's pqt arm after the last micro-batch") {
    import graft.streaming.MlStreams
    import scala.jdk.CollectionConverters._
    val emb = Tables(spark, sf, "embeddings")
    val mid = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("emb_dist")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("dist_part")
      part.select("vec_id", "label", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, emb.filter(col("vec_id") <= mid))
    writePart("b.parquet", 20000L, emb.filter(col("vec_id") > mid))
    val stream = spark.readStream.schema(MlStreams.embeddingSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    // complete-mode state: the final 8 cells reflect BOTH micro-batches,
    // scored against the SAME held-fixed trained codebooks as batch q106
    val got = EventStreams.runToMemory(
        MlStreams.distortionCells(stream, sf), "dist_t", outputMode = "complete")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = queries.VectorOps.q106PqDistortion.fn(spark, sf)
      .filter(col("arm") === "pqt")
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == batch,
      s"streamed distortion cells diverge from q106 pqt: got=$got")
  }

  test("streaming centroid cells equal batch q26's exact sums after the last micro-batch") {
    import graft.streaming.MlStreams
    import scala.jdk.CollectionConverters._
    val emb = Tables(spark, sf, "embeddings")
    val mid = emb.agg(expr("percentile_approx(vec_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("emb_cent")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("cent_part")
      part.select("vec_id", "label", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, emb.filter(col("vec_id") <= mid))
    writePart("b.parquet", 20000L, emb.filter(col("vec_id") > mid))
    val stream = spark.readStream.schema(MlStreams.embeddingSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    // complete-mode state: the final cell table reflects BOTH micro-batches
    val got = EventStreams.runToMemory(
        MlStreams.centroidCells(stream), "cent_t", outputMode = "complete")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getString(2), r.getLong(3)))).toMap
    // the batch reference: the same exact decimal sum + count per cell
    import org.apache.spark.sql.graft.SumExpressions.{decimal9_nanos, sum128Nanos}
    val batch = emb
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy(col("label"), col("idx").cast("long").as("idx"))
      .agg(sum128Nanos(decimal9_nanos(col("v").cast("double")))
        .cast("string").as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getString(2), r.getLong(3)))).toMap
    assert(got == batch,
      s"streamed centroid cells diverge: ${(got.keySet -- batch.keySet).take(3)}")
    // and the streamed mean equals batch q26's m bit-for-bit per cell
    val q26 = queries.VectorOps.q26VectorMean.fn(spark, sf).collect()
      .map(r => ((r.getInt(0).toLong, r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, (s, n)) =>
      assert(java.lang.Double.compare(
        new java.math.BigDecimal(s).doubleValue() / n, q26(k)) == 0, s"cell $k")
    }
  }

  test("streaming video shot stats equal batch q79 row-for-row (stateless twin)") {
    import graft.streaming.DocumentStreams
    import scala.jdk.CollectionConverters._
    val docs = Tables(spark, sf, "documents")
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("docs_shots")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("shots_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, docs.filter(col("doc_id") <= mid))
    writePart("b.parquet", 20000L, docs.filter(col("doc_id") > mid))
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val got = EventStreams.runToMemory(
      DocumentStreams.videoShotStats(stream), "shots_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = queries.MultimodalOps.q79VideoShots.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == batch,
      s"streamed shot stats diverge: ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
  }

  test("streaming heavy-hitter sketch merges cells across micro-batches") {
    import graft.streaming.DocumentStreams
    // two doc_id-split files => two micro-batches: the count-min cells must
    // ACCUMULATE across the boundary for the final table to equal the batch
    // sketch over the whole corpus
    val docs = Tables(spark, sf, "documents")
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("docs_cms")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("cms_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, docs.filter(col("doc_id") <= mid))
    writePart("b.parquet", 20000L, docs.filter(col("doc_id") > mid))
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    // complete mode: the bounded cell table IS the result, re-emitted whole
    val gotCells = EventStreams.runToMemory(
      DocumentStreams.heavyHitterCells(stream), "cms_t", outputMode = "complete")
    val batchCells = DocumentStreams.heavyHitterCells(docs)
    def cellSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cellSet(gotCells) == cellSet(batchCells),
      "streamed cell table diverges from the batch sketch — state did not merge")
    // readout: the estimate is a true overestimate of every exact df, and
    // bit-equal to the batch readout (same cells, same min-of-rows)
    import org.apache.spark.sql.graft.TextExpressions.shingle_hashes
    import graft.functions.TextFunctions.tokens
    val dft = docs
      .select(col("doc_id"), explode(array_distinct(shingle_hashes(tokens("text")))).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
    val est = DocumentStreams.estimateHitters(gotCells, dft.select("fp"))
    val joined = est.join(dft, "fp")
    assert(joined.count() == dft.count())
    assert(joined.filter(col("est") < col("df")).count() == 0,
      "count-min estimate fell below an exact document frequency")
  }

  test("streaming importance flags: logw_n6 bit-identical to the batch DSIR scorer") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_dsir")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    // flag-everything threshold so every doc's score crosses the wire
    val streamed = EventStreams.runToMemory(
      DocumentStreams.importanceFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        docs, minLogwN6 = Long.MinValue), "dsir_t")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val batch = queries.TextOps.importanceScored(docs)
      .select(col("doc_id"),
        floor(col("logw") * 1000000 + lit(0.5)).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty)
    // every batch-scored doc streams to the IDENTICAL quantized weight
    batch.foreach { case (id, n6) =>
      assert(streamed.get(id).contains(n6),
        s"doc $id: batch logw_n6 $n6 vs streamed ${streamed.get(id)}")
    }
    // streamed extras can only be bigram-less docs (batch excludes them)
    val extras = streamed.keySet -- batch.keySet
    assert(extras.forall(id => streamed(id) == 0L),
      s"non-trivial streamed docs missing from batch: $extras")
    // the threshold gate actually gates
    val gated = EventStreams.runToMemory(
      DocumentStreams.importanceFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        docs, minLogwN6 = 1L), "dsir_gate_t")
      .collect().map(_.getLong(4))
    assert(gated.nonEmpty && gated.forall(_ >= 1L))
  }

  test("streaming pq_encode: pq_code bit-identical to the batch encode") {
    import graft.streaming.MlStreams
    val emb = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("emb_pqenc")
    emb.write.mode("overwrite").parquet(dir.toString + "/s")
    val out = EventStreams.runToMemory(
      MlStreams.pqEncode(
        spark.readStream.schema(MlStreams.embeddingSchema)
          .parquet(dir.toString + "/s"), sf), "pqenc_t")
    // same output contract as the batch stage: embedding REPLACED by code
    assert(!out.columns.contains("embedding"))
    val streamed = out.select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.sources.PqCodebooks.encodeDelta(spark, sf, emb)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming blocklist flags equal batch q94's flagged set exactly") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_blk")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    val streamed = EventStreams.runToMemory(
      DocumentStreams.blocklistFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s")),
      "blk_t").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val batch = queries.CurationOps.q94BlocklistFilter.fn(spark, sf)
      .filter(col("n_hits") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming repetition flags equal batch q96's dropped set exactly") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_rep")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    def key(r: org.apache.spark.sql.Row, o: Int) =
      r.getLong(0) -> (r.getLong(o), r.getLong(o + 1), r.getLong(o + 2),
        r.getLong(o + 3))
    val streamed = EventStreams.runToMemory(
      DocumentStreams.repetitionFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s")),
      "rep_t").collect().map(key(_, 3)).toMap
    val batch = queries.CurationOps.q96RepetitionFilter.fn(spark, sf)
      .filter(!col("kept")).collect().map(key(_, 3)).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming boilerplate-chunk flags: no false negatives vs the exact chunk join") {
    import graft.streaming.DocumentStreams
    import org.apache.spark.sql.graft.TextExpressions.cdc_chunks
    import graft.functions.TextFunctions.tokens
    val docs = Tables(spark, sf, "documents")
    // exact truth: docs whose distinct CDC chunks intersect the corpus's
    // repeated-chunk relation (q121's rollup)
    val repeated = queries.TextOps.cdcChunkStats(docs).select("chunk")
    val exact = docs
      .select(col("doc_id"),
        explode(array_distinct(cdc_chunks(tokens("text"), 8))).as("chunk"))
      .join(repeated, "chunk").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("docs_bpc")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    val flagged = EventStreams.runToMemory(
      DocumentStreams.boilerplateChunkFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus = docs), "bpc_t")
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty && exact.subsetOf(flagged),
      s"bloom flags missed repeated-chunk docs: ${exact -- flagged}")
    // fpp sanity: flags are not wildly inflated beyond the exact set
    assert(flagged.size <= exact.size + math.max(5, docs.count() / 10),
      s"false-positive volume unreasonable: ${flagged.size} vs exact ${exact.size}")
  }

  test("streaming char-concentration flags equal batch q120's flagged set bit-for-bit") {
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_conc")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))
    val streamed = EventStreams.runToMemory(
      DocumentStreams.charConcentrationFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s")),
      "conc_t").collect().map(key).toMap
    val batch = queries.CurationOps.q120CharConcentration.fn(spark, sf)
      .filter(col("is_flagged")).drop("is_flagged").collect().map(key).toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming keyword flags equal batch q102 exactly against the frozen stats") {
    // the twin scores arriving docs against (df, N) frozen from the SAME
    // corpus batch q102 computes them from, so every (doc, rank) row must
    // be bit-identical — in-row run-length tf + literal-map idf ≡ the
    // batch explode→groupBy→join→window pipeline
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_kw")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val streamed = EventStreams.runToMemory(
      DocumentStreams.keywordFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus = docs),
      "kw_t").collect().map(key).toMap
    val batch = queries.TextOps.q102DocKeywords.fn(spark, sf)
      .collect().map(key).toMap
    assert(batch.nonEmpty && streamed == batch,
      s"keyword twin diverged: ${(streamed.toSet -- batch.toSet).take(3)}")
    // the vocab bound fails loudly, it never truncates silently
    intercept[IllegalArgumentException] {
      DocumentStreams.keywordFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus = docs, maxVocab = 1)
    }
  }

  test("streaming curriculum flags equal the curriculum_order stage bit-for-bit") {
    // the twin scores arriving docs against the LM dims and quartile
    // thresholds frozen from the SAME corpus the batch stage derives
    // them from, so every (doc, n_tokens, nll_n6, phase) row must be
    // bit-identical — literal dims + nllScore ≡ broadcast dims +
    // nllScore (ONE fold implementation)
    import graft.streaming.DocumentStreams
    import graft.jobs.{CurationStages, StageSpec}
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_curr")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    val streamed = EventStreams.runToMemory(
      DocumentStreams.curriculumFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus = docs),
      "curr_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // batch reference: the stage's phase per doc + the batch scorer's
    // quantized score per doc
    val stagePhase = CurationStages(docs, StageSpec("curriculum_order", Map.empty))
      .filter(col("phase").isNotNull)
      .select("doc_id", "phase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchScore = queries.TextOps.perplexityScored(docs)
      .select(col("doc_id"), col("n_tokens"),
        floor(col("nll_raw") * lit(1000000L) + lit(0.5)).cast("long").as("nll_n6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.nonEmpty && streamed.keySet == stagePhase.keySet)
    streamed.foreach { case (id, (nTok, nll6, phase)) =>
      assert(phase == stagePhase(id), s"doc $id phase diverged")
      assert((nTok, nll6) == batchScore(id), s"doc $id score diverged")
    }
    graft.Caches.clearAll(spark)
  }

  test("streaming bigram-perplexity flags equal batch q118 bit-for-bit") {
    // the twin scores arriving docs against the class-bigram model
    // frozen from the SAME corpus batch q118 trains on, through the ONE
    // shared fold expression — every (doc, n_tokens, nll2_n6) row must
    // be bit-identical
    import graft.streaming.DocumentStreams
    val docs = Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_bppl")
    docs.write.mode("overwrite").parquet(dir.toString + "/s")
    val streamed = EventStreams.runToMemory(
      DocumentStreams.bigramPerplexityFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/s"),
        corpus = docs),
      "bppl_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = queries.TextOps.q118BigramPerplexity.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty && streamed == batch,
      s"bigram twin diverged: ${(streamed.toSet -- batch.toSet).take(3)}")
    graft.Caches.clearAll(spark)
  }

  test("streaming contamination flags: no false negatives vs the exact overlap") {
    import graft.streaming.DocumentStreams
    import org.apache.spark.sql.graft.TextExpressions.ngram_hashes
    import graft.functions.TextFunctions.tokens
    val docs = Tables(spark, sf, "documents")
    val train = docs.filter(col("source") =!= "src19")
    val test19 = docs.filter(col("source") === "src19")
    // exact per-test-doc overlap with the train gram set (no cap, no bloom)
    val trainFps = train
      .select(explode(array_distinct(ngram_hashes(tokens("text"), 4))).as("fp"))
      .distinct()
    val exact = test19
      .select(col("doc_id"), explode(array_distinct(
        ngram_hashes(tokens("text"), 4))).as("fp"))
      .join(trainFps, "fp")
      .groupBy("doc_id").count()
      .filter(col("count") >= 2)
      .collect().map(_.getLong(0)).toSet
    // streamed flags via the broadcast bloom filter
    val dir = java.nio.file.Files.createTempDirectory("docs_contam")
    test19.write.mode("overwrite").parquet(dir.toString + "/t")
    val flagged = EventStreams.runToMemory(
      DocumentStreams.contaminationFlags(
        spark.readStream.schema(DocumentStreams.schema).parquet(dir.toString + "/t"),
        train), "contam_t")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"bloom flags missed truly-contaminated docs: ${exact -- flagged}")
    // fpp sanity: flags are not wildly inflated beyond the exact set
    assert(flagged.size <= exact.size + math.max(5, test19.count() / 10),
      s"false-positive volume unreasonable: ${flagged.size} vs exact ${exact.size}")
  }

  test("streaming funnel converges to batch q75 stages over a time-split two-batch run") {
    import graft.streaming.EventStreams
    import scala.jdk.CollectionConverters._
    val events = Tables(spark, sf, "events")
    val cut = events.selectExpr("unix_micros(min(ts)) + 15*86400000000").head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("funnel_stream")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("funnel_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, events.filter(expr(s"unix_micros(ts) < $cut")))
    writePart("b.parquet", 20000L, events.filter(expr(s"unix_micros(ts) >= $cut")))
    val emitted = EventStreams.runToMemory(
      EventStreams.funnelStages(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1))),
      "funnel_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
    val streamed = emitted.groupBy(_._1).map { case (u, rs) =>
      u -> rs.maxBy(_._2)._3
    }
    val batch = queries.EventOps.funnelStages(events)
      .select(col("user_id"),
        coalesce(expr("unix_micros(t1)"), lit(-1L)),
        coalesce(expr("unix_micros(t2)"), lit(-1L)),
        coalesce(expr("unix_micros(t3)"), lit(-1L)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed == batch,
      s"streamed funnel stages diverge from batch: ${
        (streamed.toSet -- batch.toSet).take(3)} / ${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("streaming funnel: a late earlier signup revises the whole downstream chain") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val t0 = java.time.Instant.parse("2026-02-01T00:00:00Z").toEpochMilli
    def nanos(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000000L
    def us(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000L
    def writeFile(dir: java.nio.file.Path, name: String, mod: Long,
        rows: Seq[Row]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("funnel_rev")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), EventStreams.rawSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(mod)
    }
    val dir = java.nio.file.Files.createTempDirectory("funnel_rev_src")
    // batch 1: chain anchored at the 120-min signup — the 60-min click and
    // 70-min purchase are BEFORE it and rejected; click@130 makes t2
    writeFile(dir, "a.parquet", 10000L, Seq(
      Row(1L, nanos(120), 1L, "signup", 0.0, "{}"),
      Row(2L, nanos(60), 1L, "click", 0.0, "{}"),
      Row(3L, nanos(70), 1L, "purchase", 0.0, "{}"),
      Row(4L, nanos(130), 1L, "click", 0.0, "{}")))
    // batch 2: a LATE signup at 50 min lowers t1 — the rejected candidates
    // become the new chain (the retained-candidate state is the point)
    writeFile(dir, "b.parquet", 20000L, Seq(
      Row(5L, nanos(50), 1L, "signup", 0.0, "{}")))
    val rows = EventStreams.runToMemory(
      EventStreams.funnelStages(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1))),
      "funnel_rev_t").collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(
      (us(120), us(130), -1L),
      (us(50), us(60), us(70))),
      s"revision chain wrong: ${rows.toSeq}")
  }

  test("streaming funnel: post-horizon activity re-emits the finalized chain, never a reset (tombstone)") {
    // 4 batches: (1) user 1 completes a chain; (2) another user's far-
    // future event advances the watermark past user 1's horizon; (3) a
    // further batch with NO user-1 rows lets the event-time timeout fire —
    // pre-round-13 this REMOVED the state, so (4) a post-horizon user-1
    // event rebuilt it from scratch: rev restarted at 1 (tying with the
    // finalized emission under the max-rev contract) and the chain reset.
    // The finalized tombstone must instead re-emit the SAME chain at
    // strictly higher rev.
    import graft.streaming.EventStreams
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val t0 = java.time.Instant.parse("2026-04-01T00:00:00Z").toEpochMilli
    def nanos(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000000L
    def us(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000L
    def writeFile(dir: java.nio.file.Path, name: String, mod: Long,
        rows: Seq[Row]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("funnel_tomb")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), EventStreams.rawSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(mod)
    }
    val day = 1440L
    val dir = java.nio.file.Files.createTempDirectory("funnel_tomb_src")
    writeFile(dir, "a.parquet", 10000L, Seq(
      Row(1L, nanos(0), 1L, "signup", 0.0, "{}"),
      Row(2L, nanos(60), 1L, "click", 0.0, "{}"),
      Row(3L, nanos(120), 1L, "purchase", 0.0, "{}")))
    writeFile(dir, "b.parquet", 20000L, Seq(
      Row(4L, nanos(30 * day), 2L, "view", 0.0, "{}")))
    // user 1 has no rows here: their event-time timeout fires this batch
    writeFile(dir, "c.parquet", 30000L, Seq(
      Row(5L, nanos(30 * day + 60), 2L, "view", 0.0, "{}")))
    // post-horizon user-1 activity (above the watermark, so admitted)
    writeFile(dir, "d.parquet", 40000L, Seq(
      Row(6L, nanos(30 * day + 30), 1L, "click", 0.0, "{}")))
    val u1 = EventStreams.runToMemory(
      EventStreams.funnelStages(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1))),
      "funnel_tomb_t").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    val chain = (us(0), us(60), us(120))
    assert(u1.nonEmpty && u1.head._2 == chain, s"initial chain wrong: ${u1.toSeq}")
    assert(u1.length >= 2, s"post-horizon event emitted nothing: ${u1.toSeq}")
    // re-admission: strictly higher rev, identical finalized chain
    assert(u1.last._1 > u1.head._1, s"rev not monotone across eviction: ${u1.toSeq}")
    assert(u1.forall(_._2 == chain),
      s"post-horizon emission diverged from the finalized chain: ${u1.toSeq}")
  }

  test("streaming drift monitor: finalized windows score PSI identically to the batch formulation") {
    import graft.streaming.DocumentStreams
    // (ts, n_chars) stream: each document gets a deterministic ingest time
    // spread over 5 hours so multiple sliding windows finalize
    val base = "2026-05-01T00:00:00Z"
    val withTs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("ts", expr(
        s"timestamp'$base' + make_interval(0, 0, 0, 0, 0, cast(doc_id % 300 as int), 0)"))
      .select("ts", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("drift_stream")
    withTs.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    // the static train distribution: the corpus' own bucket histogram
    val train = Tables(spark, sf, "documents")
      .groupBy(least(expr("n_chars div 200"), lit(9L)).as("bucket")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainCounts = (0L to 9L).map(b => train.getOrElse(b, 0L))
    val stream = spark.readStream
      .schema("ts timestamp, n_chars long").parquet(dir.toString)
    val got = graft.streaming.EventStreams.runToMemory(
      DocumentStreams.driftMonitor(stream, trainCounts), "drift_t")
    // batch twin: the same operator over the same frame computes every
    // window; emitted streamed rows must match it exactly
    val batch = DocumentStreams.driftMonitor(withTs, trainCounts)
      .withColumnRenamed("psi_n9", "psi_b")
      .withColumnRenamed("n_window", "nw_b")
    val joined = got.join(batch, Seq("window_start", "bucket"), "inner")
    assert(joined.count() == got.count() && got.count() > 0)
    assert(joined.filter(col("psi_n9") =!= col("psi_b") ||
      col("n_window") =!= col("nw_b")).count() == 0)
    // only windows the final watermark left open may be withheld
    val maxTs = withTs.agg(max("ts")).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 4 * 3600 * 1000L)
    val missing = batch.join(got.select("window_start", "bucket"),
      Seq("window_start", "bucket"), "left_anti")
    assert(missing.filter(col("window_start") < cutoff).count() == 0)
    // the monitor is the q81 audit's arithmetic: a window whose counts
    // equal the train distribution scores PSI 0 in every bucket — feed the
    // train histogram through the stateless scorer shape directly
    val selfRows = DocumentStreams.driftMonitor(
      withTs, trainCounts, windowDur = "24 hours", slide = "24 hours")
    val self = selfRows.filter(col("n_window") > 0)
    // one 24h window holds the whole corpus: n_window == n_train per bucket
    assert(self.filter(col("n_window") =!= col("n_train")).count() == 0)
    assert(self.filter(col("psi_n9") =!= 0L).count() == 0)
  }

  test("streaming BPE encode: stateless per-row encoding equals batch q84 row-for-row") {
    import graft.streaming.DocumentStreams
    val merges = queries.TextOps.learnBpeMerges(spark, sf)
      .map { case (_, pa, pb, _, _) => (pa, pb) }
    val dir = java.nio.file.Files.createTempDirectory("bpe_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .parquet(dir.toString)
    val got = graft.streaming.EventStreams.runToMemory(
      DocumentStreams.bpeEncode(stream, merges), "bpe_enc_t")
    val batch = queries.TextOps.q84BpeApply.fn(spark, sf)
      .withColumnRenamed("n_tok", "nt_b").withColumnRenamed("n_sym", "ns_b")
    val joined = got.join(batch, "doc_id")
    // stateless: EVERY document emits, and all values match the batch twin
    assert(got.count() == batch.count() && joined.count() == got.count())
    assert(joined.filter(col("n_tok") =!= col("nt_b") ||
      col("n_sym") =!= col("ns_b")).count() == 0)
  }

  test("streaming SQ8 quantization: stateless per-row codes equal batch q85 row-for-row") {
    import graft.streaming.DocumentStreams
    val dir = java.nio.file.Files.createTempDirectory("quant_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val stream = spark.readStream
      .schema(Tables(spark, sf, "embeddings").schema).parquet(dir.toString)
    val got = graft.streaming.EventStreams.runToMemory(
      DocumentStreams.quantizeEmbeddings(stream), "quant_t")
    val batch = queries.VectorOps.q85EmbedQuant.fn(spark, sf)
      .withColumnRenamed("qscale", "qs_b").withColumnRenamed("code_sum", "cs_b")
      .withColumnRenamed("mse", "mse_b")
    val joined = got.join(batch, "vec_id")
    assert(got.count() == batch.count() && joined.count() == got.count())
    assert(joined.filter(col("qscale") =!= col("qs_b") ||
      col("code_sum") =!= col("cs_b") || col("mse") =!= col("mse_b")).count() == 0)
  }

  test("streaming retention: a late earlier event re-cohorts and shifts every offset") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val t0 = java.time.Instant.parse("2026-03-01T00:00:00Z").toEpochMilli
    def nanos(day: Long): Long = (t0 + day * 86400000L) * 1000000L
    def writeFile(dir: java.nio.file.Path, name: String, mod: Long,
        rows: Seq[Row]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ret_rev")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), EventStreams.rawSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(mod)
    }
    val dir = java.nio.file.Files.createTempDirectory("ret_rev_src")
    // batch 1: cohort day 10, offsets {0, 2}
    writeFile(dir, "a.parquet", 10000L, Seq(
      Row(1L, nanos(10), 1L, "view", 0.0, "{}"),
      Row(2L, nanos(12), 1L, "view", 0.0, "{}")))
    // batch 2: a LATE day-9 event — the cohort drops to 9 and every
    // previously-seen day's offset shifts (+1)
    writeFile(dir, "b.parquet", 20000L, Seq(
      Row(3L, nanos(9), 1L, "view", 0.0, "{}")))
    val rows = EventStreams.runToMemory(
      EventStreams.retentionDays(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1)),
        watermark = "96 hours"), "ret_rev_t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxRev = rows.map(_._1).max
    val epochDay9 = (t0 / 86400000L) + 9
    assert(rows.filter(_._1 == maxRev).map(r => (r._2, r._3)).toSet ==
      Set((epochDay9, 0L), (epochDay9, 1L), (epochDay9, 3L)),
      s"re-cohorted offsets wrong: ${rows.toSeq}")
    // the pre-revision emission carried the old cohort (day 10, offsets 0/2)
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet ==
      Set((epochDay9 + 1, 0L), (epochDay9 + 1, 2L)))
  }

  test("streaming transition flow emits exactly the watermark-finalized batch q80 prefix") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.expressions.Window
    import scala.jdk.CollectionConverters._
    val events = Tables(spark, sf, "events")
    val bounds = events.selectExpr("unix_micros(min(ts))", "unix_micros(max(ts))").head
    val (minUs, maxUs) = (bounds.getLong(0), bounds.getLong(1))
    val cut = minUs + 15L * 86400000000L
    val dir = java.nio.file.Files.createTempDirectory("flow_stream")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("flow_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, events.filter(expr(s"unix_micros(ts) < $cut")))
    writePart("b.parquet", 20000L, events.filter(expr(s"unix_micros(ts) >= $cut")))
    // flusher batch: one far-future event per user invokes every group at
    // the final watermark (its own 10-day gap can never make a transition)
    writePart("c.parquet", 30000L, events.groupBy("user_id").agg(max("ts").as("m"))
      .select((col("user_id") + 1000000000L).as("event_id"),
        (col("m") + expr("INTERVAL 10 DAYS")).as("ts"), col("user_id"),
        lit("view").as("event_type"), lit(0.0).as("value"), lit("{}").as("props")))
    val emitted = EventStreams.runToMemory(
      EventStreams.transitionFlow(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1)),
        watermark = "31 minutes"), "flow_t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // batch truth: per-user within-session adjacent pairs (q80's core),
    // restricted to the finalized prefix (to-event at or below the final
    // watermark = real-data max − the 31-minute delay)
    val wNext = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    val cutoff = maxUs - 31L * 60000000L
    val batch = queries.EventOps.sessionizedEvents(events)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(wNext).as("to_type"),
        lead(expr("unix_micros(ts)"), 1).over(wNext).as("to_us"))
      .filter(col("to_type").isNotNull && col("to_us") <= cutoff)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(emitted == batch,
      s"flow multiset diverges: ${(emitted.toSet -- batch.toSet).take(3)} / ${
        (batch.toSet -- emitted.toSet).take(3)}")
  }

  test("streaming retention days converge to batch q76 over a time-split two-batch run") {
    import graft.streaming.EventStreams
    import scala.jdk.CollectionConverters._
    val events = Tables(spark, sf, "events")
    val cut = events.selectExpr("unix_micros(min(ts)) + 15*86400000000").head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("ret_stream")
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ret_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, events.filter(expr(s"unix_micros(ts) < $cut")))
    writePart("b.parquet", 20000L, events.filter(expr(s"unix_micros(ts) >= $cut")))
    val emitted = EventStreams.runToMemory(
      EventStreams.retentionDays(
        EventStreams.readEvents(spark, dir.toString, maxFilesPerTrigger = Some(1))),
      "ret_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // max-rev snapshot per user is that user's final (cohort, offsets) set
    val finalPairs = emitted.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val maxRev = rs.map(_._2).max
      rs.filter(_._2 == maxRev).map(r => (r._3, r._4))
    }
    val streamed = finalPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batch = queries.EventOps.q76Retention.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"streamed retention diverges: ${(streamed.toSet -- batch.toSet).take(3)} / ${
        (batch.toSet -- streamed.toSet).take(3)}")
  }

  test("spend alert state survives micro-batches without the user's events") {
    // Regression: the timeout used to be currentWatermark+1, so a
    // sub-threshold accumulator was evicted at the first watermark advance
    // after ANY micro-batch lacking that user's events — output depended on
    // micro-batch boundaries. With the fix the horizon is the user's own
    // max event time + the watermark delay.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import scala.jdk.CollectionConverters._
    val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z").toEpochMilli
    def nanos(offsetMin: Long): Long = (t0 + offsetMin * 60000L) * 1000000L
    def writeFile(dir: java.nio.file.Path, name: String, mod: Long,
        rows: Seq[Row]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("alert_batch")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), EventStreams.rawSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(mod)
    }
    val dir = java.nio.file.Files.createTempDirectory("alert_multibatch")
    // batch 1: user 1 accumulates 60 (below the 100 threshold)
    writeFile(dir, "a.parquet", 10000L,
      Seq(Row(1L, nanos(0), 1L, "view", 60.0, "{}")))
    // batch 2: only user 2 — advances the watermark while user 1 is idle
    writeFile(dir, "b.parquet", 20000L,
      Seq(Row(2L, nanos(30), 2L, "view", 1.0, "{}")))
    // batch 3: user 1 returns within the 2h horizon; 60+60 crosses 100
    writeFile(dir, "c.parquet", 30000L,
      Seq(Row(3L, nanos(40), 1L, "view", 60.0, "{}")))
    val stream = spark.readStream.schema(EventStreams.rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val got = EventStreams.runToMemory(
      EventStreams.spendAlerts(stream, 100.0), "alerts_mb")
      .select("user_id", "accum", "n_events").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 120.0, 2L)),
      s"expected the batch-1 accumulation to survive batch 2; got ${got.toSeq}")
  }

  test("flatMapGroupsWithState spend alerts match a sequential batch replay") {
    val threshold = 500.0
    val stream = EventStreams.readEvents(spark, eventsPath)
    val got = EventStreams.runToMemory(
      EventStreams.spendAlerts(stream, threshold), "alerts_t")
      .select("user_id", "alert_ts", "accum", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // oracle: per-user sequential scan with the same alert-and-reset rule
    val events = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val expected = events.toSeq.flatMap { case (uid, rows) =>
      var accum = 0.0
      var n = 0L
      rows.sortBy(e => (e._2.getTime, e._3)).toSeq.flatMap { case (_, ts, _, v) =>
        accum += v; n += 1
        if (accum >= threshold) {
          val a = (uid, ts, accum, n)
          accum = 0.0; n = 0L
          Some(a)
        } else None
      }
    }.toSet
    assert(got.nonEmpty, "no alerts emitted — threshold too high for the data")
    assert(got == expected)
  }

  test("streaming incremental clusters: cross-batch edges converge to one cluster") {
    import graft.streaming.DocumentStreams
    // batch 1 establishes components {2,3} and {5,6}; batch 2's edge (1,2)
    // must MERGE into {1,2,3} and retro-relabel 2 and 3 — the transitive
    // case a static corpus index (nearDupFlags) can never converge
    val dir = java.nio.file.Files.createTempDirectory("cc_edges")
    def writePart(name: String, mod: Long, rows: Seq[(Long, Long)]): Unit = {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("cc_part")
      rows.toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("b1.parquet", 10000L, Seq(2L -> 3L, 5L -> 6L))
    writePart("b2.parquet", 20000L, Seq(1L -> 2L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType)))
    val emitted = EventStreams.runToMemory(
      DocumentStreams.incrementalClusters(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(dir.toString)), "cc_t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // union-by-min makes labels non-increasing per doc, so the final
    // assignment is the minimum emitted label
    val finalLabels = emitted.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).min }
    assert(finalLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // the retro-relabel actually happened: 3 was emitted under BOTH its
    // batch-1 label (2) and its post-merge label (1)
    val labelsOf3 = emitted.filter(_._1 == 3L).map(_._2).toSet
    assert(labelsOf3 == Set(2L, 1L), s"doc 3 emitted labels $labelsOf3")
    // and the untouched component {5,6} was NOT re-emitted by batch 2
    assert(emitted.count(_._1 == 5L) == 1)
  }

  test("streaming incremental clusters equal batch q62 on the full pair graph") {
    import graft.streaming.DocumentStreams
    // the real q21 pair graph, split into two arbitrary halves: whatever
    // transitive structure spans the split must converge to the labels the
    // batch pointer-jumping plan (q62) computes over the union
    val pairs = queries.TextOps.q21NgramJaccard.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val (h1, h2) = pairs.zipWithIndex.partition(_._2 % 2 == 0)
    val dir = java.nio.file.Files.createTempDirectory("cc_real")
    def writePart(name: String, mod: Long, rows: Seq[(Long, Long)]): Unit = {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("cc_rpart")
      rows.toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("h1.parquet", 10000L, h1.map(_._1))
    writePart("h2.parquet", 20000L, h2.map(_._1))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType)))
    val emitted = EventStreams.runToMemory(
      DocumentStreams.incrementalClusters(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(dir.toString)), "cc_real_t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val streamed = emitted.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).min }
    val batch = queries.DedupOps.q62DedupClusters.fn(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streamed labels diverge from batch q62 on ${
        (streamed.toSet -- batch.toSet).take(5)} / ${(batch.toSet -- streamed.toSet).take(5)}")
  }

  /** Write the documents table into `dir` as two doc_id-split parquet files
    * so maxFilesPerTrigger=1 yields two micro-batches.
    */
  private def twoBatchDocs(prefix: String): String = {
    val docs = Tables(spark, sf, "documents")
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    def writePart(name: String, mod: Long, part: org.apache.spark.sql.DataFrame): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory(s"${prefix}_part")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dir.resolve(name)
      java.nio.file.Files.move(f, dest)
      dest.toFile.setLastModified(mod)
    }
    writePart("a.parquet", 10000L, docs.filter(col("doc_id") <= mid))
    writePart("b.parquet", 20000L, docs.filter(col("doc_id") > mid))
    dir.toString
  }

  test("readEvents starts on an empty source directory (footer probe falls back)") {
    // a streaming source dir may exist but hold no files yet at startup;
    // the schema probe must fall back to the declared raw schema, not throw
    val dir = java.nio.file.Files.createTempDirectory("events_empty").toString
    val df = EventStreams.readEvents(spark, dir)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming leakage-safe split equals batch q68 across micro-batches") {
    import graft.streaming.DocumentStreams
    // the static cluster map is the batch q62 component relation — the
    // dimension side a production ingest would refresh periodically
    val clusterMap = graft.operators.Components.connectedComponents(
        graft.sources.PairGraph(spark, sf)
          .filter(col("jaccard") >= 0.5).select("a", "b"))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .option("maxFilesPerTrigger", 1).parquet(twoBatchDocs("docs_split"))
    val got = EventStreams.runToMemory(
      DocumentStreams.assignSplit(stream, clusterMap), "split_t")
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = queries.DedupOps.q68LeakageSafeSplit.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == batch,
      s"streamed split diverges: ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
    // the leakage contract holds on the streamed labels too: one split per
    // cluster, even when a cluster's docs arrived in different batches
    assert(got.groupBy(_._2).forall { case (_, rows) => rows.map(_._3).size == 1 },
      "a near-dup cluster straddled splits in the streamed assignment")
  }

  test("streaming chunk windows equal batch q69 across micro-batches") {
    import graft.streaming.DocumentStreams
    val stream = spark.readStream.schema(DocumentStreams.schema)
      .option("maxFilesPerTrigger", 1).parquet(twoBatchDocs("docs_chunk"))
    val got = EventStreams.runToMemory(
      DocumentStreams.chunkWindows(stream, 64, 48), "chunk_t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batch = queries.PipelineOps.q69ChunkWindows.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == batch)
  }
}
