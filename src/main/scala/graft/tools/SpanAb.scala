package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 interleaved A/B: q67's span-fingerprint production —
  * slice + concat_ws + rolling_hash (materializes the 8-token string per
  * span) vs the fused ngram_hashes kernel (hashes each token once,
  * composes windows). Both arms run the full occurrence relation through
  * the duplicate-discovery aggregate, the chain that evaluates occ in
  * q67. Bench session settings, noop sink, alternation within one JVM.
  * Not in the driver contract.
  */
object SpanAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val k = 8
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
    def t = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    def occOld = t.filter(size(col("w")) >= k)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (k - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        org.apache.spark.sql.graft.SketchExpressions
          .rolling_hash(concat_ws(" ", slice(col("w"), col("i"), lit(k))))
          .as("fp"))
    def occNew = t
      .select(col("doc_id"), posexplode(org.apache.spark.sql.graft
        .TextExpressions.ngram_hashes(col("w"), k)).as(Seq("p", "fp")))
      .select(col("doc_id"), (col("p") + 1).as("i"), col("fp"))
    def dup(occ: org.apache.spark.sql.DataFrame) = occ.groupBy("fp")
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("i"))).as("keep"))
      .filter(col("c") >= 2)
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    require(dup(occOld).count() == dup(occNew).count(), "arms disagree")
    time(dup(occOld)); time(dup(occNew)) // warmup
    val (os, ns) = (scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { os += time(dup(occOld)); ns += time(dup(occNew)) }
      else { ns += time(dup(occNew)); os += time(dup(occOld)) }
    }
    def m(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[spanab] SLICE+CONCAT median=${m(os.toSeq)}%.3f min=${os.min}%.3f | " +
      f"FUSED median=${m(ns.toSeq)}%.3f min=${ns.min}%.3f (n=$reps, dup counts equal)")
    spark.stop()
  }
}
