package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism rules every QueryDef follows so the driver's pandas-level
  * hash compare is bit-exact across engines (enforced by
  * tools/selfcheck.py + tools/drivergate.py):
  *   - output dtypes are DOUBLE/BIGINT/TIMESTAMP/STRING/BOOLEAN — never
  *     DECIMAL, HUGEINT or DATE, which pandas renders differently per
  *     engine;
  *   - order-FIXED float arithmetic (per-row dots, scores, window prefix
  *     sums) runs as sequential double folds — bit-deterministic in any
  *     IEEE engine, no decimals needed;
  *   - order-NONdeterministic reductions (grouped sums under shuffles and
  *     partial aggregation) use exact integer arithmetic: integer cents
  *     for 2-decimal money (queries.Relational header) or VARCHAR-routed
  *     DECIMAL for float element sums (queries.VectorOps header) —
  *     identical exact values → one identical correctly-rounded DOUBLE
  *     projection at the end (DuckDB's direct wide-DECIMAL/HUGEINT→DOUBLE
  *     double-rounds above 2^53, hence the VARCHAR routes on its side);
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
