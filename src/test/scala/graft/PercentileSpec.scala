package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PercentileLong.percentile_long

/** PercentileLong vs the built-in percentile(): bit-for-bit equality of
  * the DOUBLE result across random grouped data — duplicates, negatives,
  * odd/even group sizes, singleton groups, several percentages, and
  * partial/merge boundaries (repartition). That equality is what lets q38
  * swap aggregates without touching its oracle.
  */
class PercentileSpec extends SparkSpec {

  test("bit-identical to the built-in percentile on generated groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val rows = (1 to 30000).map { i =>
      val g = rnd.nextInt(17) // 17 groups, some small
      val v = if (g == 16) 42L // singleton-ish constant group
        else rnd.nextInt(500).toLong - 250L // heavy duplication, negatives
      (g, v)
    } ++ Seq((17, 7L)) // true singleton group
    val df = rows.toDF("g", "v").repartition(13)
    Seq(0.0, 0.25, 0.5, 0.9, 1.0).foreach { p =>
      val diff = df.groupBy("g")
        .agg(percentile_long(col("v"), p).as("native"),
          expr(s"percentile(v, CAST($p AS DOUBLE))").as("builtin"))
        .filter(
          // bit-level compare: NaN-safe, distinguishes -0.0
          expr("CAST(native AS STRING) IS DISTINCT FROM CAST(builtin AS STRING)"))
      assert(diff.count() == 0L, s"p=$p: ${diff.collect().mkString(", ")}")
    }
  }

  test("state map growth: >2^10 distinct keys still bit-match the built-in") {
    // LongCounts starts at 1024 slots and grows at half load — force
    // several doublings and re-check equality through partial+merge
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 60000).map(_ => rnd.nextInt(20000).toLong - 10000L)
      .toDF("v").repartition(7)
    val r = df.agg(
        percentile_long(col("v"), 0.5).as("native"),
        expr("percentile(v, CAST(0.5 AS DOUBLE))").as("builtin"))
      .head
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
      s"${r.getDouble(0)} != ${r.getDouble(1)}")
  }

  test("null inputs skip; empty input is NULL; SQL registration works") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val withNulls = Seq[java.lang.Long](1L, null, 3L, null).toDF("v")
    val r = withNulls.agg(percentile_long(col("v"), 0.5).as("m")).head
    assert(r.getDouble(0) == 2.0)
    val empty = Seq.empty[Long].toDF("v")
    assert(empty.agg(percentile_long(col("v"), 0.5)).head.isNullAt(0))
    val viaSql = spark.sql(
      "SELECT percentile_long(v, 0.5) FROM VALUES (1L),(2L),(3L),(4L) AS t(v)")
      .head.getDouble(0)
    assert(viaSql == 2.5)
  }
}
