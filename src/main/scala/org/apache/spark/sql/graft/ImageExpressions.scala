package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native image expressions: the perceptual-hash hot path of the multimodal
  * dedup surface. The kernels live in [[graft.multimodal.Multimodal]]
  * (toGray / resizeNearest — the same code the decode pipeline runs), the
  * expression is just the codegen-friendly column wrapper, so a corpus scan
  * computes one 64-bit hash per row inside the fused stage with no UDF
  * serialization boundary.
  */

/** dHash-64 over a raw HWC byte buffer: `dhash64(data, channels, height,
  * width)` → BIGINT. Grayscale conversion (OpenCV weights) → 9×8 nearest
  * resize → 64 horizontal-gradient sign bits, MSB-first row-major. Encoded
  * payloads (JPEG/PNG) must be decoded first ([[graft.multimodal.Multimodal.decode]]);
  * this expression operates on the decoded buffer, like every other byte
  * kernel in the pipeline.
  */
case class DHash64(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def nullSafeEval(data: Any, c: Any, h: Any, w: Any): Any =
    java.lang.Long.valueOf(graft.multimodal.Multimodal.dhash64(
      data.asInstanceOf[Array[Byte]], c.asInstanceOf[Int],
      h.asInstanceOf[Int], w.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, c, h, w) =>
      s"graft.multimodal.Multimodal.dhash64($d, $c, $h, $w)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object ImageExpressions {
  def dhash64(data: Column, channels: Column, height: Column, width: Column): Column =
    ExpressionUtils.column(DHash64(
      ExpressionUtils.expression(data), ExpressionUtils.expression(channels),
      ExpressionUtils.expression(height), ExpressionUtils.expression(width)))
}
