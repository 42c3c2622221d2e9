package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned embedding layout: the `embeddings` table persisted
  * once as `partitionBy("bucket")` parquet, where `bucket` is the 16-bit
  * sign-LSH bucket ([[graft.queries.VectorOps.lshBucket]]). This is the
  * layout that turns the ANN probe's bucket IN-list into PARTITION PRUNING:
  * the probed scan reads only the probed directories (PartitionFilters in
  * the plan — asserted by PlanSpec), so a 4096-bucket probe against a
  * 65536-partition corpus reads ~6% of it by construction, at any scale.
  *
  * Reference analogue: LmdbRDD's key-range partitioning
  * (caffe-distri/src/main/scala/com/yahoo/ml/caffe/LmdbRDD.scala:41-95) —
  * the same store-for-the-access-pattern role, with the access pattern here
  * being bucket probes instead of key ranges.
  *
  * Scale notes: the write shuffles once on the bucket key (so each output
  * partition directory is written by one task — no small-file explosion per
  * task×bucket) and is the one-time ingest cost every ANN index pays. At
  * 100 TB, 65536 partitions of ~1.5 GB each is a healthy parquet layout;
  * at test SF the directories are small but the PLAN is the same. The
  * layout is content-addressed by source dir and layout version (plane
  * family changes bump the version), created lazily, and reused across
  * sessions of the same JVM and across JVM runs.
  */
object BucketedEmbeddings {

  /** Bump when the plane family or layout shape changes: stale directories
    * from older code must never serve a probe.
    */
  private val Version = "v2"

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def apply(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((spark, dir), synchronized { build(spark, dir) })

  /** Deterministic per-source location under the JVM temp root. The key
    * fingerprints the source parquet's path, size and mtime — a
    * regenerated testdata file at the SAME path (new round, new seed)
    * gets a fresh layout instead of silently serving stale buckets.
    */
  def layoutPath(dir: String): String = {
    val src = Paths.get(s"$dir/embeddings.parquet")
    val stamp =
      if (Files.exists(src)) s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
      else "absent"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$stamp".getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft-layout/$Version-emb-$key"
  }

  private def build(spark: SparkSession, dir: String): DataFrame = {
    val target = layoutPath(dir)
    if (!Files.exists(Paths.get(target, "_SUCCESS"))) {
      graft.Tables(spark, dir, "embeddings")
        .withColumn("bucket", graft.queries.VectorOps.lshBucket)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(target)
    }
    // partition-directory values type-infer as INT on read-back; consumers
    // cast the final projection to the oracle's BIGINT
    spark.read.parquet(target)
  }
}
