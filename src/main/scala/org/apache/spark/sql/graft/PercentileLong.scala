package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Open-addressing long→count map — the aggregation state of
  * [[PercentileLong]]. The built-in Percentile aggregate keeps an
  * OpenHashMap[AnyRef, Long], boxing every key on every row; this map is
  * two primitive arrays with linear probing (splitmix finalizer hash,
  * power-of-two capacity, growth at 1/2 load).
  */
final class LongCounts(initialCapacity: Int = 1 << 10) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  var keys = new Array[Long](cap)
  var counts = new Array[Long](cap) // count == 0 ⇔ slot empty
  var size = 0

  private def mix(k: Long): Int = {
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }

  def add(k: Long, c: Long): Unit = {
    if (size * 2 >= cap) grow()
    var i = mix(k) & (cap - 1)
    while (counts(i) != 0 && keys(i) != k) i = (i + 1) & (cap - 1)
    if (counts(i) == 0) { keys(i) = k; size += 1 }
    counts(i) += c
  }

  private def grow(): Unit = {
    val ok = keys; val oc = counts; val ocap = cap
    cap <<= 1
    keys = new Array[Long](cap)
    counts = new Array[Long](cap)
    size = 0
    var i = 0
    while (i < ocap) { if (oc(i) != 0) add(ok(i), oc(i)); i += 1 }
  }

  /** (sorted keys, matching counts) — the eval-time view. */
  def sorted(): (Array[Long], Array[Long]) = {
    val ks = new Array[Long](size)
    val cs = new Array[Long](size)
    var i = 0; var j = 0
    while (i < cap) { if (counts(i) != 0) { ks(j) = keys(i); j += 1 }; i += 1 }
    java.util.Arrays.sort(ks)
    i = 0
    while (i < size) { // second pass: counts in key order (probe each key)
      var p = mix(ks(i)) & (cap - 1)
      while (keys(p) != ks(i) || counts(p) == 0) p = (p + 1) & (cap - 1)
      cs(i) = counts(p)
      i += 1
    }
    (ks, cs)
  }
}

/** Exact percentile of a BIGINT column — value-identical to the built-in
  * `percentile(col, p)` (property-tested bit-for-bit in PercentileSpec):
  * same per-value counting, same sorted accumulation, and the same
  * interpolation `(higher−pos)·lowerVal + (pos−lower)·higherVal` at
  * pos = p·(N−1). The difference is the state: primitive long arrays
  * instead of a boxed OpenHashMap[AnyRef, Long], and a compiled child
  * projection instead of interpreted eval (q38: the built-in spent its
  * time boxing 1.2M keys per pass at sf0.1).
  *
  * Scale: state is O(distinct values) per group either way — bounded for
  * the integer key domains this targets (the same bound the built-in
  * relies on); the shuffle carries (key, count) pairs once per partial.
  */
case class PercentileLong(
    child: Expression,
    percentage: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongCounts] with ExpectsInputTypes {
  require(percentage >= 0.0 && percentage <= 1.0,
    s"percentage must be in [0, 1], got $percentage")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "percentile_long"

  override def createAggregationBuffer(): LongCounts = new LongCounts()

  @transient private lazy val childProj =
    org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(child))

  override def update(buf: LongCounts, input: InternalRow): LongCounts = {
    val r = childProj(input)
    if (!r.isNullAt(0)) buf.add(r.getLong(0), 1L)
    buf
  }

  override def merge(buf: LongCounts, other: LongCounts): LongCounts = {
    var i = 0
    while (i < other.counts.length) {
      if (other.counts(i) != 0) buf.add(other.keys(i), other.counts(i))
      i += 1
    }
    buf
  }

  override def eval(buf: LongCounts): Any = {
    if (buf.size == 0) return null
    val (ks, cs) = buf.sorted()
    var total = 0L
    var i = 0
    while (i < cs.length) { total += cs(i); i += 1 }
    val position = percentage * (total - 1)
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    // index of the first key whose accumulated count exceeds `rank`
    def keyAtRank(rank: Long): Long = {
      var acc = 0L
      var j = 0
      while (j < cs.length) {
        acc += cs(j)
        if (acc > rank) return ks(j)
        j += 1
      }
      ks(cs.length - 1)
    }
    val lowerKey = keyAtRank(lower)
    if (higher == lower) return lowerKey.toDouble
    val higherKey = keyAtRank(higher)
    if (higherKey == lowerKey) return lowerKey.toDouble
    (higher - position) * lowerKey.toDouble + (position - lower) * higherKey.toDouble
  }

  override def serialize(buf: LongCounts): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.counts.length) {
      if (buf.counts(i) != 0) { bb.putLong(buf.keys(i)); bb.putLong(buf.counts(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongCounts = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongCounts(math.max(n * 2, 16))
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): PercentileLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PercentileLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object PercentileLong {
  /** Exact percentile of a long column at a literal percentage. */
  def percentile_long(c: Column, percentage: Double): Column =
    ExpressionUtils.column(
      PercentileLong(ExpressionUtils.expression(c), percentage).toAggregateExpression())
}
