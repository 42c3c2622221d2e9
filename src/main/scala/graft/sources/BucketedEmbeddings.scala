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

  // Keyed on layoutPath(dir), not the raw dir: the layout path encodes the
  // source file's size+mtime fingerprint, so a regenerated embeddings.parquet
  // at the same path invalidates the cache entry along with the layout —
  // caching on the raw dir would keep serving the DataFrame bound to the
  // stale layout directory for the rest of the session.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val target = layoutPath(dir)
    cache.getOrElseUpdate((spark, target), synchronized { build(spark, dir, target) })
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic per-source location under the JVM temp root, named
    * `<Version>-emb-<sourceKey>-<stampKey>`: `sourceKey` hashes the source
    * dir alone (so all layouts of one source are identifiable siblings for
    * pruning), `stampKey` hashes the parquet's size+mtime — a regenerated
    * testdata file at the SAME path (new round, new seed) gets a fresh
    * layout instead of silently serving stale buckets.
    */
  def layoutPath(dir: String): String = {
    val src = Paths.get(s"$dir/embeddings.parquet")
    val stamp =
      if (Files.exists(src)) s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
      else "absent"
    s"${sys.props("java.io.tmpdir")}/graft-layout/$Version-emb-${md5(dir).take(16)}-${md5(stamp).take(16)}"
  }

  private def build(spark: SparkSession, dir: String, target: String): DataFrame = {
    val targetPath = Paths.get(target)
    if (!Files.exists(targetPath.resolve("_SUCCESS"))) {
      // Build into a process-unique temp dir, then atomically rename into
      // place: two JVMs sharing the tmp root (forked tests + bench) can race
      // to build the same layout, and a half-written target directory must
      // never be readable. rename(2) on the same filesystem is atomic; if
      // another JVM won, the move fails and we use its completed layout.
      val tmp = Paths.get(
        s"$target.tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      graft.Tables(spark, dir, "embeddings")
        .withColumn("bucket", graft.queries.VectorOps.lshBucket)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
      try Files.move(tmp, targetPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          if (Files.exists(targetPath.resolve("_SUCCESS"))) deleteRecursively(tmp)
          else throw e
      }
      pruneStaleSiblings(targetPath)
    }
    // partition-directory values type-infer as INT on read-back; consumers
    // cast the final projection to the oracle's BIGINT
    spark.read.parquet(target)
  }

  /** Remove older layouts of the SAME source (different stamp) and any
    * leftover `.tmp-` build dirs for it — without this, every source
    * regeneration mints a new fingerprinted directory and the tmp root
    * grows without bound across rounds.
    */
  private def pruneStaleSiblings(target: java.nio.file.Path): Unit = {
    val name = target.getFileName.toString
    val sourcePrefix = name.take(name.lastIndexOf('-') + 1) // "<Version>-emb-<sourceKey>-"
    val parent = target.getParent
    if (parent != null && Files.isDirectory(parent)) {
      val stream = Files.list(parent)
      try stream.forEach { p =>
        val n = p.getFileName.toString
        // a `.tmp-` dir may be another JVM's IN-PROGRESS build of this same
        // layout (it lost or hasn't reached the rename yet) — only reap a
        // build of THIS source (prefix match; never another source's live
        // build) and only once clearly abandoned: a long parquet write
        // touches files inside `_temporary`, leaving the top-level dir's
        // mtime at build start, so staleness is judged on the NEWEST mtime
        // anywhere in the subtree
        val isStaleTmp = n.startsWith(sourcePrefix) && n.contains(".tmp-") &&
          (try System.currentTimeMillis() - newestMtime(p) > 30 * 60 * 1000L
           catch { case _: java.io.IOException => false })
        val isOldStamp = !n.contains(".tmp-") && n != name && n.startsWith(sourcePrefix)
        if (isStaleTmp || isOldStamp)
          try deleteRecursively(p)
          catch { case _: java.io.IOException => () } // another JVM may still hold it
      } finally stream.close()
    }
  }

  /** Most recent modification time of any entry in the subtree rooted at
    * `p` — the liveness signal for an in-progress distributed write.
    */
  private def newestMtime(p: java.nio.file.Path): Long = {
    var newest = Files.getLastModifiedTime(p).toMillis
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val stream = Files.list(p)
      try stream.forEach(c => newest = math.max(newest, newestMtime(c)))
      finally stream.close()
    }
    newest
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val stream = Files.list(p)
      try stream.forEach(deleteRecursively)
      finally stream.close()
    }
    Files.deleteIfExists(p)
  }
}
