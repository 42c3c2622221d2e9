package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 probe: the q89 recall meter's cost must be CONSTANT in corpus
  * size now that its sample modulus derives from N (mod = max(8,
  * ceil(N/1024)) — the r14 fixed-modulus form was O(N²) in the
  * ground-truth arm). The test SFs cannot show this (their N sits under
  * the 8·1024 floor, where mod pins at the historical 8), so this probe
  * constructs larger corpora by replicating the sf0.1 embeddings with
  * shifted vec_ids: N ≈ 10k, 40k, 160k. The receipt is the meter's own
  * n_sample output (~constant ≈1024 once past the floor) and the wall
  * time (flat-ish, while a fixed-fraction sample would grow the truth
  * arm 16× per 4× step). Not in the driver contract; output recorded in
  * SCALE.md.
  */
object Q89ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables(spark, sfDir, "embeddings")
    val n0 = emb.count()

    def replicated(copies: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"q89probe-x$copies").toString
      val parts = (0 until copies).map(c =>
        emb.withColumn("vec_id", col("vec_id") + lit(c * n0)))
      parts.reduce(_ unionByName _)
        .coalesce(4).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    for (copies <- Seq(2, 8, 32)) {
      val dir = replicated(copies)
      val n = copies * n0
      // warm the stats/geometry layout outside the measured run (ingest
      // cost, exactly like Bench's prebuild)
      graft.sources.CorpusStats.rowCount(spark, dir)
      val t0 = System.nanoTime()
      val row = graft.queries.VectorOps.q89BandRecall.fn(spark, dir).head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[q89probe] N=$n%7d mod=${graft.queries.VectorOps.recallSampleMod(n)}%4d " +
        f"n_sample=${row.getLong(0)}%6d n_true=${row.getLong(1)}%8d " +
        f"n_cand=${row.getLong(4)}%8d recall=${row.getDouble(3)}%.3f wall=$wall%6.2f s")
      graft.Caches.clearAll(spark)
    }
    spark.stop()
  }
}
