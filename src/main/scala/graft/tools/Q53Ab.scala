package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Caches, SparkEntry}

/** q53 repeated-measure harness. Historically (rounds 10–12) this was the
  * persist-vs-recompute A/B for the exact arm's 80-row result; round 13's
  * driver-assembled shape removed that persist. Since r22 it is the
  * INTERLEAVED A/B for the arm-assembly knob
  * ([[graft.queries.VectorOps.q53FusedArms]]): FUSED (tagged-union arms,
  * two actions) vs FUTURES (per-arm collects). Both arms alternate inside
  * ONE JVM so the box's thermal drift hits them equally — cross-JVM
  * single-query comparisons on this box are noise (1.5–2× run-to-run).
  * Results are asserted identical before timing. Not in the driver
  * contract.
  */
object Q53Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.VectorOps
    def runOnce(fused: Boolean): Double = {
      VectorOps.q53FusedArms = fused
      val t0 = System.nanoTime()
      SparkEntry.queries("q53_ann_recall")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Caches.clearAll(spark)
      s
    }
    // equality gate before any timing
    def rowsOf(fused: Boolean): Seq[String] = {
      VectorOps.q53FusedArms = fused
      val r = SparkEntry.queries("q53_ann_recall")(spark, sfDir)
        .collect().map(_.toString).toSeq
      Caches.clearAll(spark)
      r
    }
    require(rowsOf(true) == rowsOf(false),
      "fused and per-arm assemblies disagree — equivalence violated")
    runOnce(true); runOnce(false) // warmup both shapes (codegen/JIT)
    val (fs, us) = (scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { fs += runOnce(true); us += runOnce(false) }
      else { us += runOnce(false); fs += runOnce(true) }
      println(f"[q53ab] rep=$i fused=${fs.last}%.3f futures=${us.last}%.3f")
    }
    def m(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[q53ab] FUSED median=${m(fs.toSeq)}%.3f min=${fs.min}%.3f | " +
      f"FUTURES median=${m(us.toSeq)}%.3f min=${us.min}%.3f (n=$reps, rows equal)")
    VectorOps.q53FusedArms = true
    spark.stop()
  }
}
