package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native sketch expressions for the dedup hot path.
  *
  * The SQL-lambda formulations (`transform`/`aggregate`) evaluate an
  * interpreted expression tree per element — for MinHash that is
  * |shingles| × |hash family| tree walks per document. These expressions
  * make one call per row and run a tight JVM loop over the primitive
  * ArrayData (CodegenFallback: the per-row call is interpreted, the inner
  * loop is not — the row count is small relative to the element count, so
  * this captures ~all of the win without array-returning codegen).
  *
  * The arithmetic is EXACTLY the oracle's formula ((a·h+b) mod p minima,
  * bit-balance simhash), so results stay bit-identical to DuckDB.
  */
case class MinHashSignature(child: Expression, hashA: Seq[Long], hashB: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val k = hashA.length
  private val aArr = hashA.toArray
  private val bArr = hashB.toArray

  override def nullSafeEval(input: Any): Any = {
    val fps = input.asInstanceOf[ArrayData]
    val n = fps.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val f = fps.getLong(i)
      var j = 0
      while (j < k) {
        val h = (aArr(j) * f + bArr(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit term-frequency SimHash over an array of token hashes. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val ths = input.asInstanceOf[ArrayData]
    val n = ths.numElements()
    val balance = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = ths.getLong(i)
      var j = 0
      while (j < 32) {
        balance(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (balance(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

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
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingHash.hash(input.toString))

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
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = RollingHash.hash(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  def minhash_signature(fps: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(fps), a, b, p))

  def simhash32(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHash32(ExpressionUtils.expression(tokenHashes)))

  def rolling_hash(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))

  def token_hashes(c: Column): Column =
    ExpressionUtils.column(TokenHashes(ExpressionUtils.expression(c)))
}
