package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 receipt: the CLUSTER layer's label-merge refresh vs its full-CC
  * rebuild, in isolation (RefreshProbe's discipline one layer up). The
  * lifecycle-level delta-vs-cold comparison still shows the toy-scale
  * crossover (the trivially-rebuildable layers' merge overhead); this
  * probe records whether the CC merge ITSELF wins at the layer where the
  * verdict located the cost. Both paths run against pre-built postings /
  * pair layouts (their cost is the previous generation's), warm, in one
  * JVM, alternated.
  */
object ClusterRefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = java.nio.file.Files.createTempDirectory("clrefresh")
    sys.props("java.io.tmpdir") = scratch.toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")
    val cut = docs.stat.approxQuantile("doc_id", Array(0.9), 0.001)(0).toLong
    def corpusDir(tag: String, all: Boolean): String = {
      val d = java.nio.file.Files.createDirectories(
        scratch.resolve(s"c-$tag")).toString
      (if (all) docs else docs.filter(col("doc_id") <= cut))
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val prev = corpusDir("prev", all = false)
    val full = corpusDir("full", all = true)
    // prerequisites both paths share (previous generation's cost): prev's
    // full layout chain, and full's postings+pairs
    graft.sources.ClusterAssignment(spark, prev)
    graft.sources.ShinglePostings.refreshed(spark, full, prev)
    graft.sources.PairGraph(spark, full)
    def time(label: String)(f: => Unit): Double = {
      Thread.sleep(200)
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cluster-refresh] $label $s%6.2f s"); s
    }
    // alternate arms so box heat hits both; the frames are recomputed per
    // rep (count() forces the full CC / merge work, nothing persisted
    // across reps beyond the shared prerequisite layouts)
    (1 to 3).foreach { rep =>
      time(s"rebuild(full CC) rep$rep") {
        graft.sources.ClusterAssignment.inlineFrame(spark, full).count()
      }
      time(s"merge(label delta) rep$rep") {
        val (df, merged) = graft.sources.ClusterAssignment.refreshFrame(spark, full, prev)
        require(merged, "probe corpus unexpectedly vanished edges")
        df.count()
      }
    }
    spark.stop()
  }
}
