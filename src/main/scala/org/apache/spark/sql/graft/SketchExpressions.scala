package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the dedup hot path.
  *
  * The SQL-lambda formulations (`transform`/`aggregate`) evaluate an
  * interpreted expression tree per element — for MinHash that is
  * |shingles| × |hash family| tree walks per document. These expressions
  * make one call per row into a tight static kernel ([[ExprKernels]]) and
  * participate in whole-stage codegen (`doGenCode` emits the same kernel
  * call), so they never force the enclosing projection out of the fused
  * stage.
  *
  * The arithmetic is EXACTLY the oracle's formula ((a·h+b) mod p minima,
  * bit-balance simhash), so results stay bit-identical to DuckDB.
  */
case class MinHashSignature(child: Expression, hashA: Seq[Long], hashB: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val aArr = hashA.toArray
  private val bArr = hashB.toArray

  override def nullSafeEval(input: Any): Any =
    ExprKernels.minhash(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the hash-family coefficients ride as generated-class references
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.minhash($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit term-frequency SimHash over an array of token hashes. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.simhash32(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar polynomial rolling hash of a string's code points —
  * fold of acc·31 + cp (mod 1e9+7), identical to the SQL-lambda
  * `aggregate(transform(split(s,''), ascii), …)` and DuckDB's
  * `list_reduce([unicode(ch) …])`, one call per value instead of one
  * tree-walk per character.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.rollingHash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val P = 1000000007L
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** [[RollingHash]] applied to every element of a string array. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.tokenHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.tokenHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of a long array's elements testing positive against a serialized
  * Bloom filter — the streaming flaggers' membership probe
  * (DocumentStreams contamination / near-dup / image near-dup) as a
  * codegen'd expression. The Scala-UDF form it replaces boxed every key
  * into a Seq per row AND pushed the map-only flagger projection out of
  * whole-stage codegen. The filter travels as its serialized bytes (the
  * expression is shipped to executors with the plan — broadcast-
  * equivalent, like the banded queries' plane literals) and deserializes
  * once per JVM via the transient lazy; generated code probes the shared
  * [[ExprKernels.bloomHits]] kernel through a class reference.
  *
  * Bloom semantics are the caller's contract: no false negatives, `fpp`
  * inflates counts slightly (see the flaggers' scaladocs).
  */
case class BloomHits(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      ExprKernels.bloomHits(input.asInstanceOf[ArrayData], bloom))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.bloomHits($c, $bfRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomHits {
  /** Serialize a built filter for the expression's plan-embedded form. */
  def serialize(bloom: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}

/** Per-bucket counts of a non-negative long array under `x % m` — the
  * hashed-feature bag vector (DSIR's bucket counts) as one codegen'd
  * traversal. The compose form (64 `filter`/`size` passes or an
  * explode + groupBy) either re-scans the array per bucket or pays a
  * doc-scale shuffle; this is a map-side array op. Inputs must be
  * non-negative (rolling-hash domain [0, P)) — `%` is used directly, and
  * the kernel REJECTS negative keys with the offending value (a public
  * SQL function must not turn a contract breach into an opaque
  * ArrayIndexOutOfBoundsException or a silently-floorMod'd bucket).
  */
case class BucketCounts(child: Expression, m: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m > 0, s"bucket_counts: m must be positive, got $m")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bucket_counts"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.bucketCounts(input.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.bucketCounts($c, $m)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intra-document repetition statistics over an n-gram fingerprint array:
  * `[top, dup]` — the highest multiplicity of any single gram, and the
  * number of occurrences belonging to grams appearing ≥ 2 times (the two
  * numerators of Rae et al. 2021 §A1.1's top-n-gram-fraction and
  * duplicate-n-gram-fraction quality rules). One codegen'd sort +
  * run-length pass per row; the compose form is O(n²) nested filter
  * lambdas per document. Map-only by construction — repetition is a
  * PER-DOCUMENT property, so no explode, no doc-keyed shuffle, at any
  * corpus size.
  */
case class DupRunStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_run_stats"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.dupRunStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ExprKernels.dupRunStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact |A ∩ B| over two SORTED-ascending `array<long>` columns as one
  * linear merge per row — the per-candidate verify kernel of the dedup
  * calibration family (q31/q100/q107's exact-Jaccard intersects over
  * [[graft.sources.DocFingerprints]]-shaped sets).
  *
  * Equivalence contract: for inputs that are sorted ascending with
  * DISTINCT elements — which every call site guarantees by construction
  * (`sort_array(array_distinct(…))` or the DocFingerprints layout, whose
  * rows are exactly that) — the result equals
  * `size(array_intersect(a, b))` bit-for-bit (property-tested in
  * CodegenGuardSpec against random sorted-distinct arrays). The built-in pays
  * an OpenHashSet build over one side plus a materialized intersection
  * array per ROW-PAIR; candidate verifies run this millions of times per
  * query, so the allocation-free merge is the hot-path win (guide-§4
  * "per-task work" after the §2 candidate bounding is already in place).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprKernels.sortedIntersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ExprKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {

  /** One-merge |A ∩ B| over two sorted-distinct array<long> columns. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** One-pass per-bucket counts over an array<long> column. */
  def bucket_counts(keys: Column, m: Int): Column =
    ExpressionUtils.column(BucketCounts(ExpressionUtils.expression(keys), m))

  /** One-pass `[top multiplicity, duplicated occurrences]` over an
    * array<long> n-gram fingerprint column.
    */
  def dup_run_stats(fps: Column): Column =
    ExpressionUtils.column(DupRunStats(ExpressionUtils.expression(fps)))
  def minhash_signature(fps: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(fps), a, b, p))

  /** One-pass Bloom-membership count over an array<long> column. */
  def bloom_hits(keys: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ExpressionUtils.column(BloomHits(ExpressionUtils.expression(keys),
      BloomHits.serialize(bloom)))

  def simhash32(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHash32(ExpressionUtils.expression(tokenHashes)))

  def rolling_hash(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))

  def token_hashes(c: Column): Column =
    ExpressionUtils.column(TokenHashes(ExpressionUtils.expression(c)))
}
