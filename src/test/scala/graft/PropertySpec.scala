package graft

import graft.agg.VectorMean
import graft.multimodal.{MediaSample, Multimodal}
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests (SURVEY §5 rebuild strategy: "VectorMean property tests
  * (ScalaCheck)"): algebraic invariants the distributed plans rely on —
  * pure-function properties, no Spark session, run by sbt's ScalaCheck
  * framework.
  */
object KernelProperties extends Properties("graft.kernels") {

  property("Datum codec: encode/parse round-trips arbitrary field values") =
    Prop.forAll(Gen.chooseNum(0, 64), Gen.chooseNum(0, 255), Gen.chooseNum(0, 1 << 20),
      Gen.listOfN(8, Gen.chooseNum(-1e6f, 1e6f)), Gen.oneOf(true, false)) {
      (c, h, label, floats, enc) =>
        val d = graft.sources.Datum(channels = c, height = h, width = c * h,
          data = Array.tabulate(c % 16)(_.toByte), label = label,
          floatData = floats.toArray, encoded = enc)
        val back = graft.sources.Datum.parse(graft.sources.Datum.encode(d))
        back.channels == d.channels && back.height == d.height &&
          back.width == d.width && back.label == d.label &&
          back.encoded == d.encoded && back.data.toSeq == d.data.toSeq &&
          back.floatData.toSeq == d.floatData.toSeq
    }

  property("cents recovery: round(v*100) exactly recovers 2-decimal money doubles") =
    Prop.forAll(Gen.chooseNum(0L, 1000000000L)) { k => // up to $10M in cents
      val v = k / 100.0 // the (inexact) double a 2-decimal value stores as
      math.round(v * 100).toLong == k
    }

  private val vecGen = Gen.listOfN(4, Gen.chooseNum(-100f, 100f))

  property("VectorMean: arbitrary partial split merges to the global mean") =
    Prop.forAll(Gen.nonEmptyListOf(vecGen), Gen.chooseNum(0, 1000)) { (data, seed) =>
      val vm = new VectorMean(4)
      val split = seed % (data.size + 1)
      val (l, r) = data.splitAt(split)
      val bufL = l.foldLeft(vm.zero)((b, v) => vm.reduce(b, v))
      val bufR = r.foldLeft(vm.zero)((b, v) => vm.reduce(b, v))
      val merged = vm.finish(vm.merge(bufL, bufR))
      val expected = (0 until 4).map(i => data.map(_(i).toDouble).sum / data.size)
      merged.zip(expected).forall { case (g, e) =>
        math.abs(g - e) < 1e-6 * math.max(1.0, math.abs(e))
      }
    }

  property("chwToHwc: permutation — preserves byte multiset and length") =
    Prop.forAll(Gen.chooseNum(1, 4), Gen.chooseNum(1, 8), Gen.chooseNum(1, 8)) { (c, h, w) =>
      val data = Array.tabulate(c * h * w)(i => (i * 13 % 251).toByte)
      val out = Multimodal.chwToHwc(data, c, h, w)
      out.length == data.length && out.sorted.toSeq == data.sorted.toSeq
    }

  property("resizeNearest: output dims and identity at same size") =
    Prop.forAll(Gen.chooseNum(1, 12), Gen.chooseNum(1, 12), Gen.chooseNum(1, 12), Gen.chooseNum(1, 12)) {
      (w, h, ow, oh) =>
        val s = MediaSample("p", "x", 3, h, w, encoded = false,
          Array.tabulate(w * h * 3)(i => (i % 251).toByte))
        val r = Multimodal.resizeNearest(s, ow, oh)
        val identity = Multimodal.resizeNearest(s, w, h)
        r.width == ow && r.height == oh && r.data.length == ow * oh * 3 &&
          identity.data.toSeq == s.data.toSeq
    }

  property("mirror is an involution") =
    Prop.forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 8)) { (w, h) =>
      val s = MediaSample("p", "x", 3, h, w, encoded = false,
        Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte))
      Multimodal.mirror(Multimodal.mirror(s)).data.toSeq == s.data.toSeq
    }

  private val rollingHashRef: String => Long =
    _.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)

  property("rolling hash: prefix composition h(a+b) depends only on h(a) and b") =
    Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val hab = rollingHashRef(a + b)
      val comp = b.foldLeft(rollingHashRef(a))((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)
      hab == comp
    }

  property("normalize: per-channel and per-pixel modes agree with the direct formula") =
    Prop.forAll(Gen.chooseNum(1, 3), Gen.chooseNum(1, 6), Gen.chooseNum(1, 6),
      Gen.chooseNum(-128f, 128f), Gen.chooseNum(0.01f, 4f)) { (c, h, w, m0, scale) =>
      val s = MediaSample("p", "x", c, h, w, encoded = false,
        Array.tabulate(c * h * w)(i => (i * 37 % 256).toByte))
      val chanMean = Array.tabulate(c)(i => m0 + i)
      val pixMean = Array.tabulate(c * h * w)(i => m0 - i % 7)
      val perChan = Multimodal.normalize(s, chanMean, scale)
      val perPix = Multimodal.normalize(s, pixMean, scale)
      perChan.indices.forall { i =>
        perChan(i) == ((s.data(i) & 0xFF) - chanMean(i % c)) * scale &&
          perPix(i) == ((s.data(i) & 0xFF) - pixMean(i)) * scale
      }
    }

  property("BPE greedy merge: skip-2 pairing equals the delimiter-wrapped string replace") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "c")),
      Gen.oneOf(("a", "b"), ("a", "a"), ("ab", "c"), ("b", "a"))) { (sy, pair) =>
      val (pa, pb) = pair
      // the driver trainer's greedy pairing
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == pa && sy(i + 1) == pb) {
          out += pa + pb; i += 2
        } else { out += sy(i); i += 1 }
      }
      // the SQL form: delimiter-wrapped replace, left-to-right past each match
      val wrapped = sy.mkString(".", "..", ".")
      val replaced = wrapped.replace(s".$pa..$pb.", s".$pa$pb.")
      val viaReplace = replaced.stripPrefix(".").stripSuffix(".").split("\\.\\.").toSeq
      out.toSeq == viaReplace
    }
}

/** Spark-dependent property-style checks (seeded loops — the SQL expression
  * must agree with the reference Scala fold on arbitrary ASCII input).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("native Tokenize matches the SQL regex-split formulation on adversarial input") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abzAZ019 \t\n.,;:!?-_'xé世İ😀" // incl. unicode + surrogate
    val texts = Seq.fill(300) {
      Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "   ", "a", "A1b2C3", "İstanbul", "--edge--", "0", "😀x😀")
    val df = texts.toDF("text")
    val native = df.select(graft.functions.TextFunctions.tokens("text").as("t"))
      .collect().map(_.getSeq[String](0))
    val sql = df.selectExpr(
      graft.functions.TextFunctions.tokensSparkSql("text") + " AS t")
      .collect().map(_.getSeq[String](0))
    assert(native.toSeq == sql.toSeq)
  }

  test("fused ShingleHashes equals RollingHash over materialized bigram strings") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.fill(120) {
      Seq.fill(rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
    } ++ Seq(Seq(), Seq("solo"), Seq("a", "b"), Seq("é世", "😀x"))
    val df = docs.map(_.mkString(" ")).toDF("text")
    val fused = df.select(org.apache.spark.sql.graft.TextExpressions
        .shingle_hashes(graft.functions.TextFunctions.tokens("text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    val composed = df.select(
        graft.functions.TextFunctions.wordBigrams(
          graft.functions.TextFunctions.tokens("text")).as("bg"))
      .collect().map(_.getSeq[String](0)
        .map(org.apache.spark.sql.graft.RollingHash.hash))
    assert(fused.toSeq.map(_.toSeq) == composed.toSeq.map(_.toSeq))
  }

  test("arity-4 ShingleHashes equals RollingHash over materialized 4-gram strings") {
    val rnd = new scala.util.Random(13)
    val docs = Seq.fill(120) {
      Seq.fill(rnd.nextInt(10))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
    } ++ Seq(Seq(), Seq("one", "two", "three"), Seq("a", "b", "c", "d"),
      Seq("é世", "😀x", "q", "r", "s"))
    val df = docs.map(_.mkString(" ")).toDF("text")
    val fused = df.select(org.apache.spark.sql.graft.TextExpressions
        .ngram_hashes(graft.functions.TextFunctions.tokens("text"), 4).as("h"))
      .collect().map(_.getSeq[Long](0))
    // re-tokenize the same way (the unicode edge rows tokenize differently
    // from the raw word lists), then window+hash locally
    val tokLists = df.select(
        graft.functions.TextFunctions.tokens("text").as("t"))
      .collect().map(_.getSeq[String](0))
    val composed = tokLists.map { toks =>
      if (toks.length < 4) Seq.empty[Long]
      else toks.sliding(4).map(w =>
        org.apache.spark.sql.graft.RollingHash.hash(w.mkString(" "))).toSeq
    }
    assert(fused.toSeq.map(_.toSeq) == composed.toSeq)
  }

  test("arity-8 ShingleHashes over RAW space-split tokens equals " +
      "RollingHash of the space-joined window (q67's span fingerprint)") {
    // q67's spans hash split(text, ' ') words — unfiltered case/punct and
    // possible empty tokens from double spaces — so the pin runs over
    // exactly that token grammar, not tokenize()'s
    val rnd = new scala.util.Random(17)
    val docs = Seq.fill(120) {
      Seq.fill(rnd.nextInt(14))(
        Seq.fill(rnd.nextInt(7))((33 + rnd.nextInt(90)).toChar).mkString)
    } ++ Seq(Seq(), Seq.fill(7)("x"), Seq.fill(8)("Y!"), Seq.fill(9)(""))
    import org.apache.spark.sql.functions.{col, split}
    val df = docs.map(_.mkString(" ")).toDF("text")
    val fused = df.select(org.apache.spark.sql.graft.TextExpressions
        .ngram_hashes(split(col("text"), " "), 8).as("h"))
      .collect().map(_.getSeq[Long](0))
    val tokLists = df.select(split(col("text"), " ").as("t"))
      .collect().map(_.getSeq[String](0))
    val composed = tokLists.map { toks =>
      if (toks.length < 8) Seq.empty[Long]
      else toks.sliding(8).map(w =>
        org.apache.spark.sql.graft.RollingHash.hash(w.mkString(" "))).toSeq
    }
    assert(fused.toSeq.map(_.toSeq) == composed.toSeq)
  }

  test("fingerprint expression matches the reference Scala fold on random ASCII") {
    val rnd = new scala.util.Random(42)
    val texts = Seq.fill(50) {
      val len = rnd.nextInt(80)
      Seq.fill(len)((32 + rnd.nextInt(95)).toChar)
        .mkString.replace("'", "x").replace("\\", "y")
    }.filter(_.nonEmpty)
    val got = texts.toDF("text")
      .select(graft.functions.TextFunctions.fingerprint("text"))
      .as[Long].collect().toSeq
    val expected = texts.map(t =>
      t.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L))
    assert(got == expected)
  }
}
