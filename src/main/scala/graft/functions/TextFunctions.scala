package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (tokenize / fingerprint / shingle / quality), built on Spark SQL
  * higher-order functions so everything stays inside whole-stage codegen —
  * no Scala UDF, no serialization breaks.
  *
  * Reference semantics mirrored: the `sentence2Words` regex tokenizer
  * (reference tools/Conversions.scala:22-29) and vocab build
  * (tools/Vocab.scala:28-43), generalized to the documents table.
  *
  * Engine-parity notes (DuckDB oracle): `split`/`string_split_regex`,
  * `ascii`/`unicode`, and left-fold hashes behave identically; the rolling
  * hash seeds with 0 so Spark's `aggregate(arr, 0, f)` equals DuckDB's
  * `list_reduce(arr, f)` (which seeds with the first element).
  */
object TextFunctions {

  /** Spark SQL text of the tokenizer (for embedding in larger exprs where
    * a Column can't be spliced). The Column API ([[tokens]]) runs the
    * native Tokenize expression instead — same results, one tight scan
    * per row rather than a regex pass + interpreted filter lambda.
    */
  def tokensSparkSql(c: String): String =
    s"filter(split(lower($c), '[^a-z0-9]+'), x -> x != '')"

  /** Lowercased alphanumeric tokens, empties dropped (native expression). */
  def tokens(c: String): Column =
    org.apache.spark.sql.graft.TextExpressions.tokenize(col(c))

  /** DuckDB-equivalent SQL for [[tokens]]. */
  def TokensSql(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), x -> x <> '')"

  /** Polynomial rolling hash of the whole string (document fingerprint):
    * fold of `acc*31 + codepoint (mod 1e9+7)` over the characters. Runs as
    * the native RollingHash expression (one call per value, tight loop) —
    * semantically identical to the SQL-lambda fold.
    */
  def fingerprint(c: String): Column =
    org.apache.spark.sql.graft.SketchExpressions.rolling_hash(expr(c))

  def FingerprintSql(c: String): String =
    s"list_reduce([unicode(ch)::BIGINT for ch in regexp_extract_all($c, '.')], " +
      s"(acc, x) -> (acc * 31 + x) % 1000000007)"

  /** Same rolling hash over an array of strings (shingle/band hashing):
    * hashes each element then folds — stable across engines.
    */
  def arrayFingerprint(arr: String): Column =
    expr(s"aggregate(transform($arr, s -> aggregate(transform(split(s, ''), ch -> ascii(ch)), 0L, " +
      s"(acc, x) -> (acc * 31 + x) % 1000000007)), 0L, (acc, h) -> (acc * 1000003 + h) % 1000000007)")

  /** Word n-grams (shingles) as space-joined strings; empty below n tokens. */
  def wordBigrams(toks: Column): Column = {
    val t = toks
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams as space-joined strings (the general form of
    * [[wordBigrams]]): one window per token position, built map-side with
    * transform + slice; empty below n tokens. The Spark twin of
    * [[WordNgramsOverT]].
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 2)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB bigram comprehension over an aliased token list `t`. */
  val WordBigramsOverT: String = "[t[i] || ' ' || t[i+1] for i in range(1, len(t))]"

  /** Explode a string-array column into its per-row DISTINCT elements
    * with occurrence counts, as a struct column `p(<keyField>, occ)` —
    * ONE array_sort + run-length pass INSIDE the row (the q102-twin
    * trick): the (element, row) level never shuffles, so a downstream
    * `groupBy(key).agg(sum(occ), count(*))` computes (n_occ, n_docs)
    * with the element-level rollup as the ONLY exchange. Every other
    * column is dropped — callers aggregate on the element alone. Shared
    * by q105's SpanStats build and q121's CDC-chunk rollup.
    */
  def runLengthExplode(df: DataFrame, arr: Column, keyField: String): DataFrame =
    df.select(array_sort(arr).as("__gs"))
      .withColumn("__starts", expr(
        "CASE WHEN size(__gs) = 0 THEN array() ELSE " +
          "filter(sequence(0, size(__gs) - 1), i -> i = 0 OR __gs[i] <> __gs[i-1]) END"))
      .select(explode(expr(
        "zip_with(__starts, " +
          "concat(slice(__starts, 2, size(__starts)), array(size(__gs))), " +
          s"(a, b) -> named_struct('$keyField', __gs[a], 'occ', CAST(b - a AS BIGINT)))"))
        .as("p"))

  /** DuckDB word-n-gram comprehension over an aliased token list `t`
    * (space-joined windows; empty when the list is shorter than n) — the
    * oracle twin of the native n-gram ShingleHashes.
    */
  def WordNgramsOverT(n: Int): String = {
    require(n >= 2)
    val joined = (0 until n).map(k => if (k == 0) "t[i]" else s"t[i+$k]")
      .mkString(" || ' ' || ")
    s"[$joined for i in range(1, len(t) - ${n - 2})]"
  }
}
