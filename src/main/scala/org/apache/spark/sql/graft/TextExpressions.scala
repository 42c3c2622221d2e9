package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer (T1 hot path): lowercase + maximal-[a-z0-9]-run scan.
  *
  * Semantically EXACTLY `filter(split(lower(s), '[^a-z0-9]+'), x -> x <> '')`
  * for any input (the non-separator segments of a regex split on the
  * complement class are precisely the maximal target-class runs, and the
  * empty-string filter removes the leading artifact), but evaluated as one
  * tight scan per row ([[ExprKernels.tokenize]]) instead of a Java regex
  * engine pass plus an interpreted lambda filter. Lowercasing uses the same
  * UTF8String .toLowerCase the built-in lower() calls, so unicode edge
  * cases agree with both Spark's and the oracle's formulation. Feeds every
  * tokenizing query (q15/16/18/19/21/31/32/39/47/49-54) and the Vocab
  * builder. Participates in whole-stage codegen (the generated code calls
  * the same static kernel), so it never breaks the enclosing stage.
  * Equivalence to the SQL formulation is property-tested (TextStackSpec).
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused word-n-gram shingle hashes: for tokens t₁..tₙ, emit the rolling
  * hash of each space-joined window "tᵢ … tᵢ₊ₐ₋₁" (arity a, default
  * bigrams) WITHOUT materializing the n-gram strings.
  *
  * The rolling hash is a left fold `acc·31 + codepoint (mod p)`, so the
  * hash of a concatenation composes: hash(a ++ b) = hash(a)·31^|b| +
  * hash(b) (mod p), |b| in codepoints. Each token is hashed ONCE
  * (h, 31^len), and a window extends by one token via
  * acc ← ((acc·31 + 32)·powₖ + hₖ) mod p — O(arity · windows) small-int
  * ops for all shingles, vs the compose form's concat allocation + second
  * hashing pass per n-gram ([[ExprKernels.shingleHashes]]; codegen-capable
  * like [[Tokenize]]). Bit-identical to RollingHash over the oracle's
  * `t[i] || ' ' || … || t[i+a-1]` comprehension (property-tested for
  * arity 2 and 4).
  */
case class ShingleHashes(child: Expression, arity: Int = 2)
    extends UnaryExpression with ExpectsInputTypes {
  require(arity >= 2, s"shingle arity must be >= 2, got $arity")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.shingleHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], arity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.shingleHashes($c, $arity)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `size(filter(tokens, x -> x IN (set)))` as a native one-pass count.
  * Higher-order functions (ArrayFilter + LambdaFunction) are
  * CodegenFallback — each call interpreted a lambda per element AND pushed
  * the whole projection out of whole-stage codegen; q19 evaluated four of
  * them per row. The set lives in a prebuilt HashSet referenced from
  * generated code. Equivalence is property-tested (TextFunctionsSpec).
  */
case class TokensInSet(child: Expression, set: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "tokens_in_set"

  @transient private lazy val hashSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    ExprKernels.tokensInSet(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], hashSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("set", hashSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.tokensInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-word occurrence counts of `words` in `tokens`, ONE pass over the
  * token array — the fused form of V × `size(t) − size(array_remove(t, w))`
  * (q66's scoring hot loop: 16 full-array scans AND 16 array allocations
  * per row collapse to a single traversal against a tiny hash map).
  * `words` is a runtime column (the broadcast vocab row), so the map
  * builds per row — O(|words|), trivial next to the token scan. Duplicate
  * words receive identical counts. Equivalence to the array_remove
  * formulation is property-tested (TextFunctionsSpec).
  */
case class TfCounts(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "tf_counts"

  override def nullSafeEval(toks: Any, words: Any): Any =
    ExprKernels.tfCounts(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      words.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"org.apache.spark.sql.graft.ExprKernels.tfCounts($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `aggregate(tokens, 0L, (a, x) -> a + length(x))` as a native sum —
  * same CodegenFallback motivation as [[TokensInSet]].
  */
case class TokenLengthSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "token_length_sum"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.tokenLengthSum(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.tokenLengthSum($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace token count: maximal non-space runs, ==
  * `size(filter(split(text, '[ ]+'), x -> x <> ''))` (property-tested).
  */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.wsTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-ish token count: match count of `[a-z]+|[0-9]+|[^a-z0-9 ]` over the
  * lowercased text, as one code-point scan ==
  * `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`
  * (property-tested).
  */
case class BpeishTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpeish_token_count"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.bpeishTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.bpeishTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-token 1-based vocab index (0 = OOV) — the q118 class mapping as a
  * hash-lookup pass; see [[ExprKernels.classSeq]].
  */
case class ClassSeq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "class_seq"

  override def nullSafeEval(toks: Any, words: Any): Any =
    ExprKernels.classSeq(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      words.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"org.apache.spark.sql.graft.ExprKernels.classSeq($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Adjacent-class pair keys — q118's bigram-count emit; see
  * [[ExprKernels.classBigramKeys]].
  */
case class ClassBigramKeys(child: Expression, c: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "class_bigram_keys"

  override def nullSafeEval(cls: Any): Any =
    ExprKernels.classBigramKeys(
      cls.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graft.ExprKernels.classBigramKeys($x, $c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The interpolated bigram-LM per-doc score — q118's scoring fold as a
  * codegen'd kernel; see [[ExprKernels.bigramNll]].
  */
case class BigramNll(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bigram_nll"

  override def nullSafeEval(cls: Any, cb: Any, cu: Any): Any =
    ExprKernels.bigramNll(
      cls.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cb.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cu.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"org.apache.spark.sql.graft.ExprKernels.bigramNll($a, $b, $c)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Character-distribution statistics `[n, k, s2]` of a string — the exact
  * integers behind q120's Simpson collision concentration s2/n² (see
  * [[ExprKernels.charStats]]): one sort + run-length pass per row vs the
  * oracle's char-explode → two-level GROUP BY histogram, so the Spark
  * side is MAP-ONLY (the per-doc statistic never shuffles characters).
  */
case class CharStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_stats"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.charStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.charStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking of a token array: space-joined chunks cut
  * AFTER every token whose rolling hash ≡ 0 (mod divisor) — expected
  * chunk length ≈ divisor tokens, boundaries chosen by CONTENT so edits
  * re-synchronize (see [[ExprKernels.cdcChunks]]; q121). One hash per
  * token, codegen-capable like [[Tokenize]].
  */
case class CdcChunks(child: Expression, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(divisor >= 1, s"cdc_chunks divisor must be >= 1, got $divisor")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.cdcChunks(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.cdcChunks($c, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row term-frequency rollup: the DISTINCT terms of a string array
  * with their multiplicities, as sorted (term, c) struct rows — one sort
  * + run-length pass per row ([[ExprKernels.termRunCounts]]). Exploding
  * the result downstream yields EXACTLY the rows of
  * `explode(terms) → groupBy(doc_id, term) → count(*)` (multiset
  * identity; property-pinned in CodegenGuardSpec), but computed inside
  * the row — term frequency is a PER-DOCUMENT statistic, so the
  * (doc_id, term) exchange the groupBy form pays is pure overhead at any
  * corpus size. Row order within the array is sorted-by-term (binary
  * order), which no consumer reads (the rows feed joins/windows keyed on
  * the term value).
  */
case class TermRunCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "term_run_counts"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.termRunCounts(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.termRunCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row token statistics `[n, k, top]` (total, distinct, max
  * multiplicity) — one sort + run-length pass
  * ([[ExprKernels.tokenStats]]). Each value equals its two-level
  * aggregate twin (`sum(c)` / `count(*)` / `max(c)` over
  * explode → groupBy(doc, tok) → count) exactly; computing them in-row
  * makes q47's repetition audit MAP-ONLY.
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.tokenStats(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.tokenStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TermRunCounts]] over 64-bit fingerprint terms: sorted (fp, c)
  * struct rows from an `array<long>` ([[ExprKernels.fpRunCounts]]) —
  * the same in-row groupBy elimination for hash-keyed term spaces
  * (q77's bigram-fingerprint tf).
  */
case class FpRunCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "fp_run_counts"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.fpRunCounts(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.fpRunCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Space-rejoin of the tokens whose 1-based position is NOT in the
  * sorted-distinct int array `drops` — q67's document reassembly
  * ([[ExprKernels.removeTokens]]) as one in-row merge. Bit-identical to
  * the explode → anti-mark → ordered re-collect formulation: surviving
  * tokens keep original order and single-space joining, and an empty
  * drop set reproduces `array_join(w, ' ')` exactly (empty tokens from
  * consecutive spaces round-trip).
  */
case class RemoveTokens(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_tokens"

  override def nullSafeEval(w: Any, drops: Any): Any =
    ExprKernels.removeTokens(
      w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      drops.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, d) =>
      s"org.apache.spark.sql.graft.ExprKernels.removeTokens($w, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  def tokenize(c: Column): Column =
    ExpressionUtils.column(Tokenize(ExpressionUtils.expression(c)))

  /** Tokens not at the given sorted 1-based positions, space-joined. */
  def remove_tokens(w: Column, drops: Column): Column =
    ExpressionUtils.column(RemoveTokens(
      ExpressionUtils.expression(w), ExpressionUtils.expression(drops)))

  /** Sorted (term, c) multiplicity rows of a string array, in-row. */
  def term_run_counts(c: Column): Column =
    ExpressionUtils.column(TermRunCounts(ExpressionUtils.expression(c)))

  /** [n_tokens, n_distinct, top multiplicity] of a string array, in-row. */
  def token_stats(c: Column): Column =
    ExpressionUtils.column(TokenStats(ExpressionUtils.expression(c)))

  /** Sorted (fp, c) multiplicity rows of a long array, in-row. */
  def fp_run_counts(c: Column): Column =
    ExpressionUtils.column(FpRunCounts(ExpressionUtils.expression(c)))

  def shingle_hashes(c: Column): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(c)))

  /** Word-n-gram rolling-hash fingerprints (decontamination / near-dup
    * blocking at arities beyond bigrams).
    */
  def ngram_hashes(c: Column, arity: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(c), arity))

  /** One-pass count of tokens contained in a small literal set. */
  def tokens_in_set(c: Column, set: Seq[String]): Column =
    ExpressionUtils.column(TokensInSet(ExpressionUtils.expression(c), set))

  /** Per-word occurrence counts of `words` in `tokens`, one pass. */
  def tf_counts(tokens: Column, words: Column): Column =
    ExpressionUtils.column(TfCounts(
      ExpressionUtils.expression(tokens), ExpressionUtils.expression(words)))

  /** Σ length(token) in code points, as a native fold. */
  def token_length_sum(c: Column): Column =
    ExpressionUtils.column(TokenLengthSum(ExpressionUtils.expression(c)))

  /** Count of maximal non-space runs (whitespace tokenization count). */
  def ws_token_count(c: Column): Column =
    ExpressionUtils.column(WsTokenCount(ExpressionUtils.expression(c)))

  /** Match count of the BPE-ish alternation over lowercased text. */
  def bpeish_token_count(c: Column): Column =
    ExpressionUtils.column(BpeishTokenCount(ExpressionUtils.expression(c)))

  /** Per-token 1-based vocab index (0 = OOV), one hash-lookup pass. */
  def class_seq(tokens: Column, vocab: Column): Column =
    ExpressionUtils.column(ClassSeq(
      ExpressionUtils.expression(tokens), ExpressionUtils.expression(vocab)))

  /** Adjacent-class bigram keys cls[i−1]·c + cls[i]. */
  def class_bigram_keys(cls: Column, c: Int): Column =
    ExpressionUtils.column(ClassBigramKeys(ExpressionUtils.expression(cls), c))

  /** Interpolated bigram-LM per-doc average −ln P (q118's fold). */
  def bigram_nll(cls: Column, cb: Column, cu: Column): Column =
    ExpressionUtils.column(BigramNll(ExpressionUtils.expression(cls),
      ExpressionUtils.expression(cb), ExpressionUtils.expression(cu)))

  /** Character-distribution stats [n, k, Σcount²] (q120's concentration). */
  def char_stats(c: Column): Column =
    ExpressionUtils.column(CharStats(ExpressionUtils.expression(c)))

  /** Content-defined chunks of a token array, cut at hash ≡ 0 (mod d). */
  def cdc_chunks(toks: Column, divisor: Int): Column =
    ExpressionUtils.column(CdcChunks(ExpressionUtils.expression(toks), divisor))
}
