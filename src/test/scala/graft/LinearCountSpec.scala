package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LinearCount.linear_count_buckets

/** LinearCountBuckets == count(DISTINCT bucket) for in-range bucket ids:
  * the bitset aggregate must be value-identical to the distinct count the
  * DuckDB oracle keeps computing, across partitions/merge orders and with
  * nulls skipped.
  */
class LinearCountSpec extends SparkSpec {

  test("filled-bucket count equals count(DISTINCT) across partitions, nulls skipped") {
    import spark.implicits._
    val m = 1 << 12
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { _ =>
      val g = rnd.nextInt(3)
      val b = if (rnd.nextInt(50) == 0) None else Some(rnd.nextInt(m).toLong)
      (g, b)
    }
    val df = rows.toDF("g", "b").repartition(16)
    val got = df.groupBy("g")
      .agg(linear_count_buckets(col("b"), m).as("lc"),
        countDistinct(col("b")).as("cd"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"group ${r.getInt(0)}: bitset ${r.getLong(1)} != distinct ${r.getLong(2)}")
    }
  }

  test("empty group evaluates to 0 and SQL registration works") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT linear_count_buckets(b, 64) FROM VALUES (CAST(NULL AS BIGINT)) AS t(b)")
      .head.getLong(0)
    assert(r == 0L)
    val r2 = spark.sql(
      "SELECT linear_count_buckets(b, 64) FROM VALUES (1L),(1L),(2L),(63L) AS t(b)")
      .head.getLong(0)
    assert(r2 == 3L)
  }

  test("out-of-range bucket ids fail loudly, not silently corrupt") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(64L).toDF("b").agg(linear_count_buckets(col("b"), 64)).collect()
    }
    assert(err.getMessage != null)
  }
}
