package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercases, splits on non-alnum, drops empties") {
    val df = Seq("Hello,  World!x9", "", "!!!", "a").toDF("text")
    val got = df.select(tokens("text").as("t")).as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "world", "x9"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq("a"))
  }

  test("fingerprint: deterministic rolling hash, seed-0 = first-element fold") {
    val df = Seq("abc", "abc", "abd").toDF("text")
    val got = df.select(fingerprint("text").as("fp")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
    // h("abc") = (( 'a'*31 + 'b')*31 + 'c') mod p, seeded with 0
    val expected = (((0L * 31 + 'a') * 31 + 'b') * 31 + 'c') % 1000000007L
    assert(got(0) == expected)
  }

  test("wordBigrams: empty below 2 tokens, n-1 bigrams otherwise") {
    val df = Seq("one two three four", "solo", "").toDF("text")
    val got = df.select(wordBigrams(tokens("text")).as("b")).as[Seq[String]].collect()
    assert(got(0) == Seq("one two", "two three", "three four"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("wordNgrams: empty below n tokens, L−n+1 windows otherwise, n=2 matches wordBigrams") {
    val df = Seq("a b c d e", "a b c", "ab", "").toDF("text")
    val got = df.select(wordNgrams(tokens("text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq.empty && got(3) == Seq.empty)
    val pair = df.select(wordNgrams(tokens("text"), 2).as("g"),
      wordBigrams(tokens("text")).as("b")).collect()
    pair.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
      "wordNgrams(2) must equal wordBigrams"))
  }

  test("native text counters equal their SQL compose forms on generated inputs") {
    import org.apache.spark.sql.graft.TextExpressions._
    // adversarial strings: unicode, runs of spaces/punct, digit/letter
    // boundaries, empty, the set words as substrings
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("the", "a", "of", "und", "x", "9", "42", "Ω", "é!",
      " ", "  ", ",", "...", "ab9", "9ab", "th", "thee", "\t", "ñ é")
    val texts = (1 to 400).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString("")
    } ++ Seq("", " ", "the of the", "a  b", "ΩΩ 9a")
    val set = Seq("the", "a", "of", "and")
    val setIn = set.map(w => s"'$w'").mkString(", ")
    val df = texts.toDF("text")
      .withColumn("t", graft.functions.TextFunctions.tokens("text"))
    val diverged = df.select(
        tokens_in_set(col("t"), set).as("n1"),
        expr(s"size(filter(t, x -> x IN ($setIn)))").as("n2"),
        token_length_sum(col("t")).as("l1"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("l2"),
        ws_token_count(col("text")).as("w1"),
        expr("size(filter(split(text, '[ ]+'), x -> x != ''))").as("w2"),
        bpeish_token_count(col("text")).as("b1"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("b2"))
      .filter(col("n1") =!= col("n2") || col("l1") =!= col("l2") ||
        col("w1") =!= col("w2") || col("b1") =!= col("b2"))
    assert(diverged.count() == 0L, diverged.collect().mkString("\n"))
  }

  test("tf_counts equals the per-word array_remove formulation, incl. duplicate words") {
    import org.apache.spark.sql.graft.TextExpressions._
    val rnd = new scala.util.Random(29)
    val vocab = Seq("the", "a", "of", "und", "x", "9", "Ω", "thee")
    val texts = (1 to 300).map { _ =>
      (1 to rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } ++ Seq("", "the the the", "zzz yyy")
    // word list includes a word ABSENT from every text and a DUPLICATE
    val words = Seq("the", "of", "absent", "Ω", "the")
    val df = texts.toDF("text")
      .withColumn("t", graft.functions.TextFunctions.tokens("text"))
      .withColumn("w", typedLit(words))
      .withColumn("tfs", tf_counts(col("t"), col("w")))
    val diverged = df.filter((1 to words.size).map(i =>
      element_at(col("tfs"), i) =!=
        (size(col("t")) - size(array_remove(col("t"), element_at(col("w"), i))))
          .cast("long")).reduce(_ || _))
    assert(diverged.count() == 0L, diverged.collect().mkString("\n"))
  }
}
