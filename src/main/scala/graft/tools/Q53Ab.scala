package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Caches, SparkEntry}

/** q53 repeated-measure harness. Historically (rounds 10–12) this was the
  * persist-vs-recompute A/B for the exact arm's 80-row result; the round-13
  * driver-assembled shape collects each arm's ≤8-row aggregate exactly once,
  * so there is no persist left to A/B — the tool now just measures the
  * query under the Bench session settings (noop write, Caches.clearAll
  * between runs) for before/after comparisons. Not in the driver contract.
  */
object Q53Ab {
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
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q53_ann_recall")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Caches.clearAll(spark)
      s
    }
    runOnce() // warmup (codegen/JIT)
    val ts = (1 to reps).map { i =>
      val s = runOnce()
      println(f"[q53ab] rep=$i t=$s%.3f")
      s
    }.sorted
    println(f"[q53ab] median=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f (n=$reps)")
    spark.stop()
  }
}
