package graft

import org.apache.spark.sql.SparkSession

/** Cache hygiene for the query runners (SURVEY Y5 discipline: persist only
  * at real reuse points — and release at the end of the scope).
  *
  * Queries like q21/q31 persist their shingle relation because it feeds
  * several plan branches within ONE query execution. The persist's scope is
  * that single run: the runner calls [[clearAll]] after materializing each
  * query so no cached plan/RDD leaks into the next query (or, on a shared
  * cluster, the next job).
  */
object Caches {
  def clearAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // driver-memo hygiene: entries of STOPPED sessions can never be read
    // again — purge them here so the hook every runner already calls keeps
    // a long-lived embedder leak-free. Live-session memos (model artifacts,
    // layout handles) are deliberately kept: evicting those per query would
    // re-pay a parquet head() per touch, the cost the memos exist to avoid.
    graft.sources.SessionMemo.purgeStopped()
  }

  /** Session-close hook for embedders: drop every driver memo keyed by
    * `spark` (model artifacts, layout/plan handles — [[graft.sources.SessionMemo]]).
    * Call before `spark.stop()` when sessions churn in one JVM.
    */
  def evictSession(spark: SparkSession): Unit =
    graft.sources.SessionMemo.evictSession(spark)

  /** Snapshot of the currently-persisted RDD ids — take one before a job,
    * pass it to [[clearCreatedSince]] after.
    */
  def snapshot(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Job-scoped release for SHARED long-lived sessions: unpersist only the
    * RDDs persisted after `before`, leaving caches owned by concurrent or
    * surrounding work untouched ([[clearAll]] would evict those too —
    * recompute cost, not correctness). Storage for the job's DataFrame
    * persists is freed here; their CacheManager plan entries are metadata
    * only after the unpersist, and a dedicated CLI process should still
    * finish with [[clearAll]].
    */
  def clearCreatedSince(spark: SparkSession, before: Set[Int]): Unit =
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = true)
    }
}
