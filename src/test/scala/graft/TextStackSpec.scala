package graft

import graft.text.{CaptionCodec, Vocab}
import org.apache.spark.sql.functions._

/** Vocab build/save/load + caption round-trip, mirroring the reference's
  * ToolTest COCO round-trip (ToolTest.scala:84-134: caption → embedding →
  * caption word-exact equality) and vocab fixtures.
  */
class TextStackSpec extends SparkSpec {
  import spark.implicits._

  test("vocab build: UNK at 1, deterministic frequency ranking from 2") {
    val docs = Seq("b b b a a c", "a b").toDF("text")
    val v = Vocab.build(docs, "text", vocabSize = 10).orderBy("id").collect()
    assert(v.head.getString(0) == Vocab.UNK && v.head.getInt(1) == 1)
    // b:4, a:3, c:1
    assert(v.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("UNK", 1), ("b", 2), ("a", 3), ("c", 4)))
  }

  test("vocab cutoff keeps top words only") {
    val docs = Seq("b b b a a c").toDF("text")
    val v = Vocab.build(docs, "text", vocabSize = 4).collect()
    assert(v.length == 3) // UNK + 2 words
    assert(!v.map(_.getString(0)).contains("c"))
  }

  test("vocab save/load round-trip preserves ids") {
    val docs = Seq("spark query join join query query").toDF("text")
    val v = Vocab.build(docs, "text", 10)
    val path = java.nio.file.Files.createTempDirectory("vocab").toString + "/v"
    Vocab.save(v, path)
    val loaded = Vocab.load(spark, path)
    assert(Vocab.toMap(loaded) == Vocab.toMap(v))
  }

  test("caption encode/decode round-trip is word-exact for in-vocab text") {
    val docs = Seq("the quick fox", "the lazy dog jumps").toDF("text")
    val vocab = Vocab.toMap(Vocab.build(docs, "text", 20))
    val enc = CaptionCodec.encode(docs, "text", vocab, len = 8)
    // shape: input starts with START, cont starts with 0 then 1s, pad -1
    val r = enc.orderBy("text").head
    val input = r.getSeq[Int](r.fieldIndex("input_sentence"))
    val cont = r.getSeq[Int](r.fieldIndex("cont_sentence"))
    val target = r.getSeq[Int](r.fieldIndex("target_sentence"))
    assert(input.length == 8 && cont.length == 8 && target.length == 8)
    assert(input.head == CaptionCodec.START_ID)
    assert(cont.head == 0 && cont(1) == 1)
    assert(target.last == CaptionCodec.PAD)
    // round-trip
    val dec = CaptionCodec.decode(enc, "target_sentence", "decoded", vocab)
    val pairs = dec.select("text", "decoded").collect()
    pairs.foreach { p => assert(p.getString(1) == p.getString(0)) }
  }

  test("OOV words encode to UNK and decode to the UNK token") {
    val trainDocs = Seq("the quick fox").toDF("text")
    val vocab = Vocab.toMap(Vocab.build(trainDocs, "text", 20))
    val oov = Seq("the unseen fox").toDF("text")
    val enc = CaptionCodec.encode(oov, "text", vocab, len = 6)
    val dec = CaptionCodec.decode(enc, "target_sentence", "decoded", vocab)
    assert(dec.head.getAs[String]("decoded") == "the UNK fox")
  }
}
