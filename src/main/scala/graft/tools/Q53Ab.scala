package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Caches, SparkEntry}
import graft.queries.VectorOps

/** Round-10 A/B: does persisting q53's 80-row exact-arm result (shared by
  * all four overlap joins) beat re-running the rank per arm? Same design
  * as [[CcAb]]: ALTERNATE the arms within one JVM so thermal drift hits
  * both equally; measurement identical to Bench (noop write,
  * Caches.clearAll between runs). Not registered in the driver contract.
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
    // warmup both arms (codegen/JIT) before measuring
    VectorOps.persistExactArm = true; runOnce()
    VectorOps.persistExactArm = false; runOnce()

    val samples = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Double)]
    (1 to reps).foreach { i =>
      Seq(i % 2 == 0, i % 2 == 1).foreach { persist =>
        VectorOps.persistExactArm = persist
        val s = runOnce()
        samples += ((persist, s))
        println(f"[q53ab] rep=$i persist=$persist t=$s%.3f")
      }
    }
    def stats(p: Boolean): (Double, Double) = {
      val ts = samples.filter(_._1 == p).map(_._2).sorted
      (ts(ts.size / 2), ts.min)
    }
    val (pm, pmin) = stats(true)
    val (nm, nmin) = stats(false)
    println(f"[q53ab] PERSIST   median=$pm%.3f min=$pmin%.3f (n=$reps)")
    println(f"[q53ab] NOPERSIST median=$nm%.3f min=$nmin%.3f (n=$reps)")
    println(s"[q53ab] winner=${if (pm <= nm) "persist" else "nopersist"}")
    VectorOps.persistExactArm = true
    spark.stop()
  }
}
