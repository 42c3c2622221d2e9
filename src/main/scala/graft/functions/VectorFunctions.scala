package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/embedding column functions (LLM-pipeline similarity surface).
  *
  * Two families:
  *   - `*Dec` — exact-DECIMAL formulations used by oracle-checked queries:
  *     float→DECIMAL(18,9) per element, products at scale 18, order-
  *     independent exact sums. Bit-identical across engines.
  *   - doubles (`cosine`, `dot`) — fast IEEE formulations for the Scala API
  *     and benchmarks, kept inside codegen via SQL higher-order functions.
  *
  * Reference analogue: the `Array[Float]` feature columns of
  * CaffeOnSpark features/test (CaffeOnSpark.scala:479) and the VectorMean
  * UDAF (VectorMean.scala:17-64); similarity search itself is a north-star
  * addition (no reference counterpart).
  */
object VectorFunctions {

  /** Exact decimal dot product of two float-array columns (sequential fold;
    * exact, so fold order is irrelevant). Result DECIMAL(38,18).
    */
  def dotDec(a: String, b: String): Column =
    expr(s"CAST(aggregate(zip_with($a, $b, (x, y) -> CAST(CAST(x AS DECIMAL(18,9)) * CAST(y AS DECIMAL(18,9)) AS DECIMAL(20,18))), " +
      s"CAST(0 AS DECIMAL(32,18)), (acc, p) -> CAST(acc + p AS DECIMAL(32,18))) AS DECIMAL(38,18))")

  /** DuckDB-equivalent SQL for [[dotDec]] over aliased list exprs.
    * The float elements are widened to DOUBLE before the decimal cast:
    * DuckDB's float→decimal conversion works in float precision (≈7 digits)
    * and lands several decimal-ulps off; Spark's float cast widens to double
    * first, so the oracle must too. The double→decimal step routes through
    * VARCHAR: DuckDB's direct double→DECIMAL rounds exact-tie values (e.g.
    * 0.1494140625 at scale 9) half-even, while Spark rounds the shortest
    * double repr HALF_UP — VARCHAR render + text→decimal reproduces Spark's
    * exact behavior (verified over 128k embedding elements).
    */
  def FloatDec(x: String): String =
    s"CAST(CAST(CAST($x AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9))"

  def DotDecSql(a: String, b: String): String =
    s"CAST(list_reduce([${FloatDec(s"$a[i]")} * ${FloatDec(s"$b[i]")} " +
      s"for i in range(1, len($a)+1)], (x, y) -> x + y) AS DECIMAL(38,18))"

  /** Output-canonical form of [[dotDec]]: the exact decimal dot projected to
    * DOUBLE for the final column (the driver hashes pandas dtypes — DECIMAL
    * outputs render as object vs float64 and always hash-mismatch). Internal
    * comparisons should keep the exact decimal; only the SELECTed column uses
    * this. Spark's Decimal→Double is correctly rounded.
    */
  def dotOut(a: String, b: String): Column = dotDec(a, b).cast("double")

  /** DuckDB twin of [[dotOut]]. DuckDB's direct DECIMAL→DOUBLE double-rounds
    * through the hugeint for unscaled values above 2^53 (scale-18 dots
    * qualify), so the oracle routes VARCHAR: exact decimal digits + correctly
    * rounded strtod — bit-identical to Spark's BigDecimal.doubleValue.
    */
  def DotOutSql(a: String, b: String): String =
    s"CAST(CAST(${DotDecSql(a, b)} AS VARCHAR) AS DOUBLE)"

  /** IEEE-double dot product — the hot-path form for real similarity search. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
