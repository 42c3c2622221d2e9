package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Growable long buffer that STOPS STORING once it holds `limit` values —
  * the aggregation state of [[CollectLongListCapped]].
  */
final class CappedLongBuffer(val limit: Int) {
  var values: Array[Long] = new Array[Long](math.min(limit, 16))
  var n: Int = 0
  def add(v: Long): Unit = if (n < limit) {
    if (n == values.length)
      values = java.util.Arrays.copyOf(values, math.min(limit, values.length * 2))
    values(n) = v
    n += 1
  }
}

/** Bounded collect_list for LongType — the skew-safe posting-list
  * aggregate. `collect_list` materializes a hot key's ENTIRE group in one
  * aggregation buffer before any downstream size filter can drop it: one
  * stopword-like shingle present in 10⁸ documents of a 100 TB corpus is a
  * multi-GB buffer in a single task. This aggregate stops accumulating at
  * `cap` values, so every buffer is ≤ cap longs by construction.
  *
  * Intended use is the capped-posting-list pattern: aggregate with
  * cap = DfCap + 1 and keep the existing `size(list) <= DfCap` filter —
  * groups within the cap collect exactly (bit-identical results), groups
  * over it surface ≥ DfCap + 1 elements and are dropped exactly as
  * before. Truncation keeps the FIRST values seen per partial (merge
  * order is execution-dependent), so only the size predicate — never the
  * truncated content — may be observed downstream.
  */
case class CollectLongListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongBuffer] with ExpectsInputTypes {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_long_list_capped"

  override def createAggregationBuffer(): CappedLongBuffer = new CappedLongBuffer(cap)

  override def update(buf: CappedLongBuffer, input: InternalRow): CappedLongBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long]) // null inputs skip, like collect_list
    buf
  }

  override def merge(buf: CappedLongBuffer, other: CappedLongBuffer): CappedLongBuffer = {
    var i = 0
    while (i < other.n && buf.n < buf.limit) { buf.add(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: CappedLongBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.n))

  override def serialize(buf: CappedLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new CappedLongBuffer(cap)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectLongListCapped =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectLongListCapped =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object AggExpressions {
  /** Bounded posting-list collect: at most `cap` longs per group buffer. */
  def collect_long_list_capped(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      CollectLongListCapped(ExpressionUtils.expression(c), cap).toAggregateExpression())
}
