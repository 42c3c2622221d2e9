package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Occupied-bucket count of a linear-counting sketch (Whang et al., TODS
  * 1990): the input is an already-hashed bucket id in [0, m) and the state
  * is an m-bit bitset (m/8 bytes, e.g. 128 KB at m = 2^20) — the aggregate
  * returns how many DISTINCT buckets were hit, from which the estimator
  * −m·ln(1 − filled/m) recovers the distinct count.
  *
  * Why not `count(DISTINCT bucket)`: Spark plans multi-column distinct
  * aggregation as Expand (one row copy per distinct column) + a two-phase
  * aggregate whose shuffle carries every distinct (group, bucket) pair —
  * O(distinct keys) rows. This aggregate's partial state is the bitset
  * itself: the shuffle carries m/8 bytes per (group × partition) no matter
  * how many rows or keys — the bounded-state promise of the sketch,
  * realized in the exchange too (q35: 2 sketches over 600k rows went
  * 1.05 s → the bitsets dominate nothing; see BENCH round 6).
  *
  * Exactness: filled-bucket counting is deterministic — same bucket set →
  * same count regardless of order/partitioning, so the DuckDB oracle's
  * count(DISTINCT bucket-expr) is bit-identical (LinearCountSpec).
  * Null bucket ids are skipped, like count(DISTINCT).
  */
case class LinearCountBuckets(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two >= 64, got $m")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "linear_count_buckets"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m >>> 6)

  // A TypedImperativeAggregate's update evaluates `child` per input row;
  // interpreted evaluation of the bucket-hash arithmetic tree would box
  // every intermediate long (and CollapseProject inlines any pre-projected
  // alias back into the aggregate, so "project it first" cannot help).
  // Compile the child once into an unsafe projection instead — the codegen
  // cache dedupes compilation process-wide.
  @transient private lazy val childProj =
    org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(child))

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val r = childProj(input)
    if (!r.isNullAt(0)) {
      val b = r.getLong(0)
      require(b >= 0 && b < m, s"bucket id $b outside [0, $m)")
      bits((b >>> 6).toInt) |= 1L << (b & 63)
    }
    bits
  }

  override def merge(bits: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits.length) { bits(i) |= other(i); i += 1 }
    bits
  }

  override def eval(bits: Array[Long]): Any = {
    var filled = 0L
    var i = 0
    while (i < bits.length) { filled += java.lang.Long.bitCount(bits(i)); i += 1 }
    filled
  }

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](bits.length * 8)
    java.nio.ByteBuffer.wrap(out).asLongBuffer().put(bits)
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bits = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(bits)
    bits
  }

  override def withNewMutableAggBufferOffset(offset: Int): LinearCountBuckets =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LinearCountBuckets =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object LinearCount {
  /** Occupied buckets of an m-bucket bitset over pre-hashed bucket ids. */
  def linear_count_buckets(c: Column, m: Int): Column =
    ExpressionUtils.column(
      LinearCountBuckets(ExpressionUtils.expression(c), m).toAggregateExpression())
}
