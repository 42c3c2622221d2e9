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

  def pcm_window_stats(data: Column, windowSamples: Column): Column =
    ExpressionUtils.column(PcmWindowStats(
      ExpressionUtils.expression(data),
      ExpressionUtils.expression(windowSamples)))

  def pcm_synth(text: Column, center: Column, gain: Column): Column =
    ExpressionUtils.column(PcmSynth(
      ExpressionUtils.expression(text), ExpressionUtils.expression(center),
      ExpressionUtils.expression(gain)))
}

/** Exact per-window PCM statistics over a 16-bit LE payload:
  * `pcm_window_stats(data, windowSamples)` →
  * array<struct<win:int, sumsq:bigint, zc:int, n:int>> — one struct per
  * full window (ragged tail dropped), running the SAME
  * [[graft.multimodal.Multimodal.pcmWindowStats]] core the rms/zcr audio
  * features derive from. Exact integers, so the oracle compare is
  * transcendental-free.
  */
case class PcmWindowStats(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = PcmWindowStats.outType
  override def prettyName: String = "pcm_window_stats"

  override def nullSafeEval(data: Any, win: Any): Any =
    PcmWindowStats.evalWindows(data.asInstanceOf[Array[Byte]], win.asInstanceOf[Int])

  // Named `evalWindows` (not `eval`): the case class inherits
  // `eval(InternalRow)` from BinaryExpression, which suppresses the static
  // forwarder Scala would otherwise emit for a companion method named `eval`,
  // so generated Java calling `PcmWindowStats.eval(byte[], int)` failed Janino
  // compilation and the whole stage silently fell back to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, w) =>
      s"org.apache.spark.sql.graft.PcmWindowStats.evalWindows($d, $w)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `pcm_synth(text, center, gain)` → 16-bit LE PCM binary: each codepoint
  * becomes one `(cp − center)·gain` sample (int16-clamped). The
  * deterministic audio-payload fake for environments without real media —
  * kernel [[graft.multimodal.Multimodal.pcmFromCodepoints]].
  */
case class PcmSynth(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_synth"

  override def nullSafeEval(text: Any, center: Any, gain: Any): Any =
    graft.multimodal.Multimodal.pcmFromCodepoints(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      center.asInstanceOf[Int], gain.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c, g) =>
      s"graft.multimodal.Multimodal.pcmFromCodepoints($t.toString(), $c, $g)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PcmWindowStats {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("win", IntegerType, nullable = false),
    StructField("sumsq", LongType, nullable = false),
    StructField("zc", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false))), containsNull = false)

  def evalWindows(data: Array[Byte], windowSamples: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val stats = graft.multimodal.Multimodal.pcmWindowStats(data, windowSamples)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(stats.map(s =>
      org.apache.spark.sql.catalyst.InternalRow(
        s.idx, s.sumSq, s.crossings, s.nSamples)).toArray[Any])
  }
}
