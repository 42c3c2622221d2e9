package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressions.{cdc_chunks, char_stats}
import org.apache.spark.sql.graft.{GraftFunctions, SketchExpressions}

/** q120's char_stats and q121's cdc_chunks kernels: hand-computed values,
  * equivalence to straightforward reference implementations on generated
  * inputs, the CDC re-synchronization property (the reason content-defined
  * boundaries exist), and the gibberish gate firing on character-level
  * damage that token-level filters cannot see.
  */
class CharCdcSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def refHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  test("char_stats: hand-computed [n, k, s2] incl. unicode, newline, empty") {
    val df = Seq("aabc", "", "aaaa", "Ωé Ωé", "ab\ncd").toDF("text")
    val got = df.select(char_stats(col("text")).as("cs")).as[Seq[Long]].collect()
    assert(got(0) == Seq(4L, 3L, 6L))  // a:2 b:1 c:1 → 4+1+1
    assert(got(1) == Seq(0L, 0L, 0L))  // empty: consumer owns the 0/0 rule
    assert(got(2) == Seq(4L, 1L, 16L)) // one char, maximal concentration
    assert(got(3) == Seq(5L, 3L, 9L))  // Ω:2 é:2 space:1 → 4+4+1
    assert(got(4) == Seq(5L, 5L, 5L))  // newline is a counted code point
  }

  test("char_stats equals the codepoint-histogram reference on generated inputs") {
    val rnd = new scala.util.Random(29)
    val alphabet = Seq("a", "b", "c", " ", "9", "Ω", "é", "\n", "\t", ".")
    val texts = (1 to 300).map { _ =>
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    } ++ Seq("", "a", " ")
    val got = texts.toDF("text")
      .select(char_stats(col("text")).as("cs")).as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, cs) =>
      val hist = t.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      val exp = Seq(hist.sum, hist.size.toLong, hist.map(r => r * r).sum)
      assert(cs == exp, s"char_stats mismatch on ${t.take(30)}")
    }
  }

  test("cdc_chunks: chunks partition the tokens and cut exactly at hash%d==0") {
    val rnd = new scala.util.Random(31)
    val vocab = Seq("value", "table", "part", "row", "fast", "merge", "batch",
      "key", "agg", "scan", "slow", "hash", "a", "the", "x9")
    val docs = (1 to 200).map { _ =>
      (1 to rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
    } ++ Seq(Seq.empty[String], Seq("value"), vocab)
    def refChunks(toks: Seq[String], d: Int): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        cur += t
        if (refHash(t) % d == 0L) { out += cur.mkString(" "); cur.clear() }
      }
      if (cur.nonEmpty) out += cur.mkString(" ")
      out.toSeq
    }
    for (d <- Seq(1, 4, 8)) {
      val got = docs.toDF("t")
        .select(cdc_chunks(col("t"), d).as("cs")).as[Seq[String]].collect()
      docs.zip(got).foreach { case (toks, cs) =>
        assert(cs == refChunks(toks, d), s"cdc_chunks($d) mismatch on $toks")
        // chunks partition the document: re-joining recovers the tokens
        assert(cs.flatMap(_.split(" ").filter(_.nonEmpty)) == toks)
        // every chunk except possibly the last ends with a cut token
        cs.dropRight(1).foreach(c =>
          assert(refHash(c.split(" ").last) % d == 0L))
      }
    }
  }

  test("cdc_chunks: boundaries re-synchronize after an insertion (the CDC property)") {
    val vocab = Seq("value", "table", "part", "row", "fast", "merge", "batch",
      "key", "agg", "scan", "slow", "hash", "a", "the")
    val cut = vocab.filter(w => refHash(w) % 8 == 0L)
    val plain = vocab.filterNot(w => refHash(w) % 8 == 0L)
    assert(cut.nonEmpty && plain.size >= 3,
      s"fixture needs both classes in the vocab (cut=$cut)")
    val base = Seq(plain(0), plain(1), cut.head, plain(2), plain(0), cut.head, plain(1))
    val edited = plain(2) +: base // insertion BEFORE the first cut token
    val Seq(a, b) = Seq(base, edited).toDF("t")
      .select(cdc_chunks(col("t"), 8).as("cs")).as[Seq[String]].collect().toSeq
    // the first chunk absorbs the insertion; every later chunk is IDENTICAL
    assert(a.size == b.size && a.size >= 2)
    assert(a.head != b.head)
    assert(a.tail == b.tail,
      "chunks after the first cut point must re-synchronize")
    // the contrast: q69-style fixed-width windows all shift by one token
    val fixedA = base.grouped(3).map(_.mkString(" ")).toSeq
    val fixedB = edited.grouped(3).map(_.mkString(" ")).toSeq
    assert(fixedA.zip(fixedB).count { case (x, y) => x == y } == 0)
  }

  test("q120 gate: character-level damage flags where token-level filters see one token") {
    // a 400-char single-character run is ONE token to q47/q96 but
    // concentration → 1 here; normal text sits far below the 5/64 gate
    val df = Seq("a" * 400, "the quick brown fox jumps over the lazy dog")
      .toDF("text")
    val got = df.select(char_stats(col("text")).as("cs"))
      .select((col("cs").getItem(2).cast("double") /
        (col("cs").getItem(0) * col("cs").getItem(0)).cast("double")).as("conc"))
      .as[Double].collect()
    assert(got(0) == 1.0)
    assert(got(0) > 0.078125 && got(1) < 0.078125)
  }

  test("char_stats / cdc_chunks callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT char_stats('aabc') AS cs, cdc_chunks(array('a', 'b'), 1) AS ch").head()
    assert(r.getSeq[Long](0) == Seq(4L, 3L, 6L))
    assert(r.getSeq[String](1) == Seq("a", "b"))
    // divisor must be a positive literal — fail loud, not corrupt
    intercept[Exception] {
      spark.sql("SELECT cdc_chunks(array('a'), 0)").head()
    }
    // non-foldable or NULL divisors get the clean usage error, not the
    // opaque ClassCastException/NPE the bare eval() cast used to throw
    spark.sql("SELECT array('a', 'b') AS t, 2 AS d").createOrReplaceTempView("__cdc")
    val eCol = intercept[Exception] {
      spark.sql("SELECT cdc_chunks(t, d) FROM __cdc").head()
    }
    assert(eCol.getMessage.contains("cdc_chunks(tokens, divisor)"), eCol.getMessage)
    val eNull = intercept[Exception] {
      spark.sql("SELECT cdc_chunks(array('a'), CAST(NULL AS INT))").head()
    }
    assert(eNull.getMessage.contains("cdc_chunks(tokens, divisor)"), eNull.getMessage)
  }

  test("ChunkStats layout equals the inline cdcChunkStats relation row-for-row") {
    // the BigramLm posture pin: the stamped artifact IS the defining
    // computation's output, so layout consumers (q121/q122) and
    // frame-based consumers (boilerplateChunkFlags) see one relation
    val docs = Tables(spark, sf, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("chunk", "n_occ", "n_docs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val layout = rows(graft.sources.ChunkStats(spark, sf))
    val inline = rows(graft.queries.TextOps.cdcChunkStats(docs))
    assert(layout.nonEmpty && layout == inline)
  }

  test("cdc token hash is THE q17 fingerprint (one hash definition engine-wide)") {
    val words = Seq("value", "Ωé", "x9")
    val viaExpr = words.toDF("w")
      .select(SketchExpressions.rolling_hash(col("w"))).as[Long].collect()
    assert(viaExpr.toSeq == words.map(refHash))
  }
}
