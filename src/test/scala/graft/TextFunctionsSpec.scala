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
}
