package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query `.explain("formatted")` dumps to individual files — the
  * optimization-round audit artifact (plans/rNN/<query>_{before,after}.txt).
  * Unlike [[graft.PlanDump]] (the PLANS.md dossier), this uses the BENCH
  * session configuration so the captured plan is the one the measured run
  * executes, and writes one file per query so before/after diffs are
  * line-anchored.
  *
  * Usage: runMain graft.tools.PlanFiles <outDir> <suffix> [sfDir] [q1,q2,...]
  *   e.g. runMain graft.tools.PlanFiles plans/r21 before /root/testdata/sf0.1 q107_simhash_calibration,q21_ngram_jaccard
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      graft.Caches.clearAll(spark)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
