package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 interleaved A/B: q10's multi-distinct — one scan with the
  * Expand plan vs four single-distinct scans crossJoined. Bench session
  * settings, noop sink, alternation within one JVM so thermal drift hits
  * both arms equally. Not in the driver contract.
  */
object Q10Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def expand = li.agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))
    def split = li.agg(countDistinct(col("l_partkey")).as("n_parts"))
      .crossJoin(li.agg(countDistinct(col("l_suppkey")).as("n_supps")))
      .crossJoin(li.agg(countDistinct(col("l_orderkey")).as("n_orders")))
      .crossJoin(li.agg(count(lit(1)).as("n_rows")))
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(expand); time(split) // warmup
    val (es, ss) = (scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { es += time(expand); ss += time(split) }
      else { ss += time(split); es += time(expand) }
    }
    def m(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[q10ab] EXPAND median=${m(es.toSeq)}%.3f min=${es.min}%.3f | SPLIT median=${m(ss.toSeq)}%.3f min=${ss.min}%.3f (n=$reps)")
    spark.stop()
  }
}
