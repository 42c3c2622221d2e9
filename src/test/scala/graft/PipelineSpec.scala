package graft

import graft.ml.{LogisticRegression, TrainConfig}
import graft.text.{CaptionCodec, Vocab}
import graft.tools.Converters
import org.apache.spark.sql.functions._

/** End-to-end pipeline: the composed engine driving a full training-data
  * flow — dedup → quality filter → vocab → encode on the text side, and
  * train → features → test-metrics → snapshot on the model side. This is
  * the integration shape a user of the engine runs; each stage is the
  * operator the per-query suites verify in isolation.
  */
class PipelineSpec extends SparkSpec {

  test("text pipeline: dedup -> quality filter -> vocab -> encode -> decode") {
    val docs = Tables(spark, sf, "documents")

    // 1. exact dedup (q20 operator shape): keep canonical doc per content hash
    val canonical = docs
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("h", "rn")
    assert(canonical.count() > 0 && canonical.count() <= docs.count())

    // 2. quality filter (q18 shape): keep docs with enough tokens
    val toks = graft.functions.TextFunctions.tokens("text")
    val kept = canonical.filter(size(toks) >= 10)
    assert(kept.count() > 0)

    // 3. vocab + caption encode/decode round-trip over the kept corpus
    val vocab = Vocab.toMap(Vocab.build(kept, "text", vocabSize = 500))
    assert(vocab(Vocab.UNK) == Vocab.UNK_ID)
    val sample = kept.limit(20)
    val enc = CaptionCodec.encode(sample, "text", vocab, len = 32)
    val dec = CaptionCodec.decode(enc, "target_sentence", "decoded", vocab)
    // every decoded prefix must equal the original's first tokens (cutoff 32)
    dec.select(col("text"), col("decoded")).collect().foreach { r =>
      val orig = r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val got = r.getString(1).split(" ").filter(_.nonEmpty)
      assert(got.toSeq == orig.take(got.length).toSeq)
    }
  }

  test("model pipeline: train -> features -> metrics -> snapshot round-trip") {
    val emb = Tables(spark, sf, "embeddings")
    val data = emb.select("vec_id", "embedding").rdd.map { r =>
      val x = r.getSeq[Float](1).toArray
      (x, if (x(0) + x(1) > 0) 1.0 else 0.0)
    }
    val lr = new LogisticRegression(64, TrainConfig(lr = 2.0, iters = 40))
    val w = lr.fit(data)
    val (acc, _) = lr.evaluate(data, w)
    assert(acc > 0.8)

    val feats = lr.features(emb, "vec_id", "embedding", w)
    assert(feats.count() == emb.count())

    val metrics = lr.test(emb, "vec_id", "embedding", w)
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    Converters.writeMetrics(spark, metrics, s"$dir/metrics")
    assert(spark.read.text(s"$dir/metrics").count() == 1)

    LogisticRegression.saveWeights(spark, w, s"$dir/weights")
    val w2 = LogisticRegression.loadWeights(spark, s"$dir/weights")
    assert(w2.toSeq == w.toSeq)
    val (acc2, _) = lr.evaluate(data, w2)
    assert(acc2 == acc)
  }

  test("curation pipeline: sample -> quality -> dedup -> decontaminate -> pack") {
    import graft.functions.TextFunctions.{fingerprint, tokens}
    val docs = Tables(spark, sf, "documents")

    // 1. deterministic stratified sample (q49 shape)
    val sampled = docs
      .withColumn("bucket", fingerprint("CAST(doc_id AS STRING)") % 100)
      .filter(col("bucket") <
        when(col("lang") === "en", 25).when(col("lang") === "de", 60).otherwise(80))
      .drop("bucket")

    // 2. quality floor (q18 shape)
    val kept = sampled.filter(size(tokens("text")) >= 10)

    // 3. exact dedup, canonical per content hash (q20 shape)
    val canonical = kept
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("h", "rn")

    // 4. decontaminate the training split against the held-out source —
    // contaminationFlags is plain column algebra, so the same function
    // serves batch frames and streams
    val train = canonical.filter(col("source") =!= "src19")
    val heldOut = docs.filter(col("source") === "src19")
    val flagged = graft.streaming.DocumentStreams
      .contaminationFlags(train, heldOut, minShared = 2)
      .select("doc_id")
    val clean = train.join(flagged, Seq("doc_id"), "left_anti")

    // 5. pack into 256-token bins per shard (q50 shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = clean
      .select(col("doc_id"), col("lang"), col("source"),
        size(tokens("text")).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin", expr("(cum_tok - n_tok) div 256"))

    // volume is monotone down the funnel and nothing is invented
    val counts = Seq(docs, sampled, kept, canonical, train, clean, packed)
      .map(_.count())
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a },
      s"funnel grew somewhere: $counts")
    assert(counts.last > 0, "pipeline filtered everything out")
    // no flagged doc survives
    assert(packed.join(flagged, "doc_id").isEmpty)
    // packing invariant per shard: cumsum is consistent and bins advance
    val oneShard = packed.orderBy("lang", "source", "doc_id")
      .collect().groupBy(r => (r.getString(1), r.getString(2)))
    oneShard.values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        cum += r.getLong(3)
        assert(r.getLong(4) == cum, "cum_tok mismatch")
        assert(r.getLong(5) == (cum - r.getLong(3)) / 256, "bin mismatch")
      }
    }
  }
}
