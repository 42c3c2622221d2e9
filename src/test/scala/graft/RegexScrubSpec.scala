package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RegexScrub.regex_scrub

/** RegexScrub vs the regexp_replace/regexp_count compose form it fuses:
  * identical scrubbed text and hit counts on adversarial inputs —
  * overlapping pattern domains (numbers inside IPs inside emails),
  * replacement text that a later pattern could re-match, empty strings,
  * and group-reference replacements.
  */
class RegexScrubSpec extends SparkSpec {

  private val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
  private val ipv4 = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
  private val num = "[0-9]+"

  test("equals the compose form on adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val frag = Seq("a@b.com", "10.0.0.1", "42", "x", " ", ".", "@", "user.name+tag@host.co",
      "999.999.999.999", "1.2", "<NUM>", "<EMAIL>7", "a1b2", "{\"k\": 21}")
    val texts = (1 to 300).map { _ =>
      (1 to rnd.nextInt(8)).map(_ => frag(rnd.nextInt(frag.size))).mkString("")
    } ++ Seq("", "no matches here", "1.2.3.4.5.6")
    val df = texts.toDF("props")
      .withColumn("sc", regex_scrub(col("props"),
        Seq(email -> "<EMAIL>", ipv4 -> "<IP>", num -> "<NUM>")))
    val diverged = df.select(
        col("sc.scrubbed").as("s1"),
        regexp_replace(regexp_replace(regexp_replace(col("props"),
          lit(email), lit("<EMAIL>")), lit(ipv4), lit("<IP>")), lit(num), lit("<NUM>")).as("s2"),
        col("sc.n_hits").as("h1"),
        (expr(s"regexp_count(props, '$email')") + expr(s"regexp_count(props, '$ipv4')") +
          expr(s"regexp_count(props, '$num')")).as("h2"))
      .filter(col("s1") =!= col("s2") || col("h1") =!= col("h2"))
    assert(diverged.count() == 0L, diverged.collect().take(5).mkString("\n"))
  }

  test("group references in replacements behave like regexp_replace") {
    import spark.implicits._
    val df = Seq("ab12cd").toDF("t")
      .withColumn("sc", regex_scrub(col("t"), Seq("([0-9]+)" -> "[$1]")))
    val got = df.select(col("sc.scrubbed"), col("sc.n_hits")).head
    assert(got.getString(0) == "ab[12]cd" && got.getInt(1) == 1)
  }
}
