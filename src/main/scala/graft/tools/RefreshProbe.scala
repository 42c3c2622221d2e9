package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probe: wall-time of the append-only postings refresh vs the
  * from-scratch rebuild it replaces, on a constructed 90%/10% split of
  * the sf corpus (v1 = 90% of documents, delta = the rest). The refresh
  * path's claim (SCALE.md): re-shingling the accumulated corpus is the
  * dominant rebuild cost and the delta merge skips it — this measures
  * that, end-to-end through the stamped layout build. Not in the driver
  * contract; output is read by a human and recorded in SCALE.md.
  */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables(spark, sfDir, "documents")
    val cut = docs.stat.approxQuantile("doc_id", Array(0.9), 0.001)(0).toLong
    // two identical v2 copies: distinct dirs → distinct stamped layout
    // paths, so the rebuild arm and the refresh arm each build cold
    // (DerivedLayout's session cache is path-keyed)
    val v1 = java.nio.file.Files.createTempDirectory("refresh-v1").toString
    val v2a = java.nio.file.Files.createTempDirectory("refresh-v2a").toString
    val v2b = java.nio.file.Files.createTempDirectory("refresh-v2b").toString
    docs.filter(col("doc_id") <= cut).coalesce(1)
      .write.mode("overwrite").parquet(s"$v1/documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$v2a/documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$v2b/documents.parquet")
    val n1 = spark.read.parquet(s"$v1/documents.parquet").count()
    val n2 = spark.read.parquet(s"$v2a/documents.parquet").count()
    println(s"[refresh] corpus v1=$n1 docs, v2=$n2 (delta ${n2 - n1})")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[refresh] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // v1 ingest (not the comparison — both arms need an old layout)
    time("v1 postings build   ")(
      graft.sources.ShinglePostings(spark, v1).count())
    time("v2 REBUILD (scratch)")(
      graft.sources.ShinglePostings(spark, v2a).count())
    time("v2 REFRESH (delta)  ")(
      graft.sources.ShinglePostings.refreshed(spark, v2b, v1).count())
    spark.stop()
  }
}
