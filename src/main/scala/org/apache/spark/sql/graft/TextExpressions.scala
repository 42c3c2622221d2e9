package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer (T1 hot path): lowercase + maximal-[a-z0-9]-run scan.
  *
  * Semantically EXACTLY `filter(split(lower(s), '[^a-z0-9]+'), x -> x <> '')`
  * for any input (the non-separator segments of a regex split on the
  * complement class are precisely the maximal target-class runs, and the
  * empty-string filter removes the leading artifact), but evaluated as one
  * tight scan per row instead of a Java regex engine pass plus an
  * interpreted lambda filter. Lowercasing uses the same UTF8String
  * .toLowerCase the built-in lower() calls, so unicode edge cases agree
  * with both Spark's and the oracle's formulation. Feeds every tokenizing
  * query (q15/16/18/19/21/31/32/39/47) and the Vocab builder.
  * Equivalence to the SQL formulation is property-tested (TextStackSpec).
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = s.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        out += UTF8String.fromString(s.substring(i, j))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

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
  * hashing pass per n-gram. Bit-identical to RollingHash over the
  * oracle's `t[i] || ' ' || … || t[i+a-1]` comprehension
  * (property-tested for arity 2 and 4).
  */
case class ShingleHashes(child: Expression, arity: Int = 2)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(arity >= 2, s"shingle arity must be >= 2, got $arity")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val P = RollingHash.P
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < arity) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    val pow = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var acc = 0L
      var p = 1L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % P
        p = (p * 31) % P
        j += Character.charCount(cp)
      }
      h(i) = acc
      pow(i) = p
      i += 1
    }
    val out = new Array[Long](n - arity + 1)
    i = 0
    while (i < n - arity + 1) {
      var acc = h(i)
      var k = i + 1
      while (k < i + arity) {
        val withSpace = (acc * 31 + 32) % P // ' ' == 32
        acc = (withSpace * pow(k) + h(k)) % P
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def tokenize(c: Column): Column =
    ExpressionUtils.column(Tokenize(ExpressionUtils.expression(c)))

  def shingle_hashes(c: Column): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(c)))

  /** Word-n-gram rolling-hash fingerprints (decontamination / near-dup
    * blocking at arities beyond bigrams).
    */
  def ngram_hashes(c: Column, arity: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(c), arity))
}
