package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k state: parallel arrays kept sorted by (score DESC,
  * id ASC), never more than k entries — the aggregation buffer of
  * [[TopKByScore]]. Most offers reject on one comparison against the
  * current worst; accepted entries binary-search + memmove into place
  * (k is small by contract — a ranking cutoff, not a collection).
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** Ranks-before test under the (score DESC, id ASC) total order, with
    * doubles compared as java.lang.Double.compare (NaN greatest, the same
    * ordering Spark's descending sort gives a double column).
    */
  private def beats(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && id < id2)
  }

  def offer(s: Double, id: Long): Unit = {
    if (n == k) {
      if (!beats(s, id, scores(n - 1), ids(n - 1))) return
      n -= 1 // evict the current worst; the insert below restores n
    }
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(scores(mid), ids(mid), s, id)) lo = mid + 1 else hi = mid
    }
    System.arraycopy(scores, lo, scores, lo + 1, n - lo)
    System.arraycopy(ids, lo, ids, lo + 1, n - lo)
    scores(lo) = s
    ids(lo) = id
    n += 1
  }
}

/** Per-group top-k WITHOUT a per-group sort shuffle: the window form
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC)` then
  * `rn <= k`) must shuffle EVERY candidate row to its group's partition
  * and sort there — at 100 TB a per-group ranking over a corpus-sized
  * candidate stream moves the corpus. This aggregate keeps a bounded
  * (score, id) buffer per group, so map-side partials reduce each
  * partition's contribution to ≤ k rows per group before the exchange;
  * the shuffle carries O(groups · k · partitions) instead of O(rows),
  * and no sort ever sees more than k elements.
  *
  * Selection is by the (score DESC, id ASC) total order — ties break on
  * id, so for unique ids the result set is EXACTLY the window form's and
  * deterministic under any partitioning/merge order. Doubles order as
  * java.lang.Double.compare (NaN greatest, matching Spark's descending
  * sort; -0.0 < 0.0 is the one divergence, unobservable for scores that
  * are dots of real data). Null score or id skips the row, like the
  * built-in collect aggregates.
  *
  * Output is array<struct<score double, id bigint>> in rank order —
  * `inline`/`explode` restores rows, or element_at(.., 1) reads the max.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {
  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.offer(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // serialized buffers are already rank-ordered; offer preserves that
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopK {
  /** Bounded per-group ranking: the k highest (score, id) pairs by
    * (score DESC, id ASC), as array<struct<score, id>> in rank order.
    */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), k).toAggregateExpression())
}
