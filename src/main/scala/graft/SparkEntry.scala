package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator the engine implements is registered here as a [[QueryDef]]:
  * a Spark implementation plus, where SQL-expressible, a DuckDB oracle that is
  * numerically bit-exact against it (see QueryDef's determinism rules).
  */
object SparkEntry {

  /** The full operator registry. Order is the SURVEY §2 walk. */
  def defs: Seq[QueryDef] =
    q.Relational.all ++ q.TextOps.all ++ q.EventOps.all ++ q.VectorOps.all ++
      q.MlOps.all ++ q.DedupOps.all ++ q.MultimodalOps.all ++ q.SqlSurface.all ++
      q.PipelineOps.all ++ q.CurationOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q3JoinRevenue.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  // ---- py4j-friendly accessors (python/graft.py) --------------------------
  // Scala Maps and function values don't cross the py4j bridge cleanly;
  // these flat signatures do (the reference exposes its Scala core to
  // CaffeOnSpark.py the same way — plain methods returning DataFrames,
  // caffe-grid/src/main/python/com/yahoo/ml/caffe/CaffeOnSpark.py:28-63).

  /** Registered query names, sorted (Java array → Python list). */
  def queryNames: Array[String] = queries.keys.toArray.sorted

  /** Run one registered query against an sf dir. */
  def runQuery(spark: SparkSession, name: String, dir: String): DataFrame =
    queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; see queryNames")) (spark, dir)

  /** The query's DuckDB oracle SQL, or "" when rows-only checked. */
  def oracleFor(name: String): String = oracleSql.getOrElse(name, "")
}
