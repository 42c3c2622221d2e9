package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway perf probe (not part of the driver contract). */
object Scratch {
  def time(label: String, runs: Int)(f: => DataFrame): Unit = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SCRATCH $label%-28s median=${ts.sorted.apply(runs / 2)}%8.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = graft.Tables(spark, dir, "lineitem")
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast(LongType)
    val filt = col("l_shipdate") <= lit("2000-12-01 00:00:00").cast(TimestampType)

    // warmup
    graft.queries.Relational.q1PricingSummary.fn(spark, dir)
      .write.format("noop").mode("overwrite").save()

    time("scan+filter+count", 5)(li.filter(filt).groupBy().count())
    time("scan all cols", 5)(li.filter(filt))
    time("agg count only", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus").count())
    time("agg 5 long sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity"))),
          sum(cents(col("l_extendedprice"))),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))),
          sum(cents(col("l_discount"))), count(lit(1))))
    time("agg 5 dec38 sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity")).cast(DecimalType(38, 0))),
          sum(cents(col("l_extendedprice")).cast(DecimalType(38, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast(DecimalType(38, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))).cast(DecimalType(38, 0))),
          sum(cents(col("l_discount")).cast(DecimalType(38, 0))), count(lit(1))))
    time("agg 5 dec20 sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity")).cast(DecimalType(20, 0))),
          sum(cents(col("l_extendedprice")).cast(DecimalType(20, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast(DecimalType(20, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))).cast(DecimalType(20, 0))),
          sum(cents(col("l_discount")).cast(DecimalType(20, 0))), count(lit(1))))
    time("q1 full current", 5)(graft.queries.Relational.q1PricingSummary.fn(spark, dir))
    time("q12 full current", 5)(graft.queries.Relational.q12Rollup.fn(spark, dir))

    // q42 decomposition
    {
      import graft.ml.KMeans
      val emb = graft.Tables(spark, dir, "embeddings")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH42 $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f"); r
      }
      (1 to 3).foreach { _ =>
        val c0 = timed("c0 collect")(KMeans.collectCentroids(KMeans.centroids(
          emb.withColumn("__k", col("label")), "__k")))
        val a0 = KMeans.assignWith(emb, c0)
        val c1 = timed("c1 collect")(KMeans.collectCentroids(KMeans.centroids(a0, "cell")))
        val a1 = KMeans.assignWith(emb, c1)
        val q = a1.filter(col("vec_id") === 0)
        val probeSet = KMeans.probeCellsWith(q, c1, nprobe = 2)
          .join(q.select(col("vec_id"), col("embedding").as("qv")), "vec_id")
          .select(col("cell").as("pcell"), col("qv"))
        timed("final job") {
          a1.filter(col("vec_id") =!= 0)
            .join(broadcast(probeSet), col("cell") === col("pcell"))
            .select(col("vec_id"), col("label"), col("cell"),
              org.apache.spark.sql.graft.VectorExpressions
                .float_dot(col("embedding"), col("qv")).as("dot"))
            .orderBy(col("dot").desc, col("vec_id"))
            .limit(10)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
