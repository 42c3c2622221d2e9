package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not in the driver contract): the CORE-COUNT scaling receipt
  * (r22, verdict item 1).
  *
  * sf0.1's bench cannot demonstrate parallel scaling — the suite is
  * scheduling-floor dominated there (8 cores beat 32 in the r21 driver
  * runs), so every 100 TB claim rested on job counts and plan shapes. This
  * tool runs the residual-wall queries on the [[ScaleCanary]] 10× corpus
  * (where compute, not the floor, dominates) at the core count given by
  * SPARK_GRAFT_CPUS and prints per-query cold/warm walls. Run it at 32 and
  * at 8 cores (ABBA order across invocations to cancel box heat drift) and
  * read the warm-wall ratio: ≈ 32/8 = 4 for a compute-bound row with
  * enough parallelism; ≈ 1 names a serial bottleneck.
  *
  * Methodology matches ScaleCanary: time from query CONSTRUCTION (driver
  * assembly included), execute the full plan via toRdd.count (no driver
  * collect of Θ(N²) outputs), Caches.clearAll between reps, warm = min of
  * `GRAFT_AB_REPS` (default 3) repeats after the cold first touch.
  *
  * Usage: SPARK_GRAFT_CPUS=8 runMain graft.tools.CoreScale [mult] [q...]
  */
object CoreScale {

  private val Targets = Seq(
    "q107_simhash_calibration", "q53_ann_recall", "q21_ngram_jaccard",
    "q74_semdedup", "q39_simhash_neardup")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val names = args.drop(if (args.headOption.exists(_.toIntOption.isDefined)) 1 else 0)
    val targets = if (names.nonEmpty) Targets.filter(names.contains) else Targets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = ScaleCanary.ensureCorpus(spark, mult)
    println(s"== corpus @ $dir, cpus=$cpus, reps=$reps")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.Caches.clearAll(spark)
      t
    }
    val out = targets.map { name =>
      val cold = once(name)
      val warm = (1 to reps).map(_ => once(name))
      println(f"== $name%-26s cpus=$cpus%s cold=$cold%7.2f warm_min=${warm.min}%7.2f warm_med=${warm.sorted.apply(warm.size / 2)}%7.2f")
      s""""$name":{"cold":$cold,"warm_min":${warm.min},"warm_med":${warm.sorted.apply(warm.size / 2)}}"""
    }
    println(s"""{"tool":"corescale","cpus":$cpus,"mult":$mult,"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
