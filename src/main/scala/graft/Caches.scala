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
  }
}
