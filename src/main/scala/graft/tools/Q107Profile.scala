package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not in the driver contract): q107 stage profile (r22,
  * verdict item 6).
  *
  * After the r21 sorted-merge-intersect kernel win, q107 remains a top
  * row; before touching anything else this tool prices each subtree in
  * ONE JVM (bench session settings, noop-equivalent toRdd.count, caches
  * cleared between reps) so the next lever is chosen from a measurement,
  * not a guess: (1) the simhash signature pass, (2) + signature
  * clustering, (3) + banding self-join to distinct signature pairs,
  * (4) + doc-pair expansion, (5) the full query (+ fps joins + intersect
  * + rollup). Row counts per stage are printed alongside.
  *
  * Usage: runMain graft.tools.Q107Profile [sfDir]
  */
object Q107Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
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

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "1_signatures" -> (() => graft.queries.DedupOps.q107Sig(spark, sfDir)),
      "2_clusters" -> (() => graft.queries.DedupOps.q107Clusters(spark, sfDir)),
      "3_sig_pairs" -> (() => graft.queries.DedupOps.q107SigPairs(spark, sfDir)),
      "4_doc_pairs" -> (() => graft.queries.DedupOps.q107DocPairs(spark, sfDir)),
      "5_full" -> (() => graft.SparkEntry.queries("q107_simhash_calibration")(spark, sfDir)))

    stages.foreach { case (name, mk) =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = mk().queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.Caches.clearAll(spark)
        (t, n)
      }
      once() // warmup
      val runs = (1 to reps).map(_ => once())
      val ts = runs.map(_._1).sorted
      println(f"[q107prof] $name%-12s rows=${runs.head._2}%9d " +
        f"min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f (n=$reps)")
    }
    spark.stop()
  }
}
