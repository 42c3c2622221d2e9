package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism rules every QueryDef follows so the driver's hash compare is
  * bit-exact across engines:
  *   - float arithmetic is done in exact DECIMAL and cast to DOUBLE only at
  *     the end (identical decimals → identical nearest-double in both engines);
  *   - division only ever happens between already-identical doubles/longs;
  *   - every result is totally ordered by a unique key combination;
  *   - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Not expressible in ANSI SQL → driver records a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
