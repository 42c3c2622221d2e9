package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 interleaved A/B: per-candidate exact-intersect cost —
  * `size(array_intersect)` (hash-set build + materialized intersection
  * per pair) vs the native `sorted_intersect_count` merge — over a
  * candidate stream shaped like q107's verify input (millions of pairs
  * of per-doc sorted-distinct fingerprint sets from the DocFingerprints
  * layout). Bench session settings, noop sink, alternation within one
  * JVM so thermal drift hits both arms equally. Not in the driver
  * contract.
  */
object IsectAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    // same topology env var as Bench/PlanFiles — a hardcoded local[32]
    // silently measures the wrong core count on other boxes (ADVICE r21)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fps = graft.sources.DocFingerprints(spark, sfDir)
    // ~6M pairs at sf0.1 (5000 docs, a < b, one side halved) — the q107
    // candidate volume without the banding preamble, so the timed work
    // is almost entirely the per-pair intersect expression
    def pairs = fps.select(col("doc_id").as("a"), col("fps").as("fpsa"))
      .filter(col("a") % 2 === 0)
      .crossJoin(fps.select(col("doc_id").as("b"), col("fps").as("fpsb")))
      .filter(col("a") < col("b"))
    def builtin = pairs.select(
      sum(size(array_intersect(col("fpsa"), col("fpsb"))).cast("long")).as("s"))
    def merged = pairs.select(
      sum(org.apache.spark.sql.graft.SketchExpressions
        .sorted_intersect_count(col("fpsa"), col("fpsb")).cast("long")).as("s"))
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val eq = builtin.head.getLong(0) == merged.head.getLong(0)
    require(eq, "arms disagree — equivalence contract violated")
    time(builtin); time(merged) // warmup
    val (bs, ms) = (scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { bs += time(builtin); ms += time(merged) }
      else { ms += time(merged); bs += time(builtin) }
    }
    def m(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[isectab] BUILTIN median=${m(bs.toSeq)}%.3f min=${bs.min}%.3f | " +
      f"MERGE median=${m(ms.toSeq)}%.3f min=${ms.min}%.3f (n=$reps, sums equal)")
    spark.stop()
  }
}
