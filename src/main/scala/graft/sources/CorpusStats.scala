package graft.sources

import org.apache.spark.sql.SparkSession

/** Ingest-time corpus statistics, persisted once per source fingerprint:
  * currently the table row count N — the input every scale-derived
  * geometry rule consumes (band depth for q28/q46/q86/q89, the IVF k
  * rule, q89's audit-sample modulus). Before this layout each banded
  * query re-ran a full-corpus `count()` job per execution to derive its
  * own geometry; with it, N is an ingest-time fact like the centroids
  * ([[IvfCentroids]]) already are, and geometry derivation costs a memo
  * lookup (first touch per session: one 1-row parquet read).
  *
  * The value is EXACTLY `count(*)` over the same source file the oracle
  * CTEs count — the stamp (source size+mtime, [[DerivedLayout]]) makes a
  * stale N impossible, so the Spark-side geometry always matches the
  * oracle's `(SELECT count(*) FROM …)` mirror.
  *
  * Reference analogue: the prototxt's declared-cardinality role —
  * corpus-level facts fixed when data lands, not re-measured per query.
  */
object CorpusStats {

  /** Bump when the stat derivation changes. */
  private val Version = "v1"

  // collected-count memo, keyed on the fingerprinted layout path like
  // IvfCentroids' table cache — staleness impossible, zero jobs after
  // first touch
  private val cache = SessionMemo.track(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long])(_._1)

  def layoutPath(dir: String, table: String): String =
    DerivedLayout.layoutPath(s"stats-$table", Version, dir,
      Seq(s"$dir/$table.parquet"))

  /** Row count of `dir/table.parquet`, built at ingest and memoized per
    * session.
    */
  def rowCount(spark: SparkSession, dir: String,
      table: String = "embeddings"): Long = {
    val target = layoutPath(dir, table)
    SessionMemo.cachedStamped(cache, spark, target)({
      val df = DerivedLayout(spark, target) { tmp =>
        import spark.implicits._
        val n = graft.Tables(spark, dir, table).count()
        Seq(n).toDF("n").coalesce(1).write.mode("overwrite").parquet(tmp)
      }
      df.head().getLong(0)
    })
  }
}
