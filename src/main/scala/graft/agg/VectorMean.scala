package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of a fixed-length float-vector column.
  *
  * Typed rebuild of the reference's `VectorMean` UDAF
  * (caffe-grid/src/main/scala/com/yahoo/ml/caffe/VectorMean.scala:17-64,
  * used by CaffeOnSpark.test at CaffeOnSpark.scala:402-411) on the
  * non-deprecated `Aggregator` API: the buffer is (partial sums, count) and
  * merge is associative, so Spark plans it as partial + final aggregation —
  * map-side combine keeps the shuffle at one buffer per partition.
  *
  * For oracle-checked exact results see queries.VectorOps.q26VectorMean,
  * which shards the element index space instead (the 100 TB formulation);
  * this Aggregator is the low-latency path when vectors fit a dense buffer.
  */
final case class VectorMeanBuffer(sums: Array[Double], var n: Long)

class VectorMean(dim: Int)
    extends Aggregator[Seq[Float], VectorMeanBuffer, Seq[Double]] {

  override def zero: VectorMeanBuffer = VectorMeanBuffer(Array.fill(dim)(0.0), 0L)

  override def reduce(b: VectorMeanBuffer, a: Seq[Float]): VectorMeanBuffer = {
    require(a.length == dim, s"expected vector of dim $dim, got ${a.length}")
    var i = 0
    while (i < dim) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VectorMeanBuffer, y: VectorMeanBuffer): VectorMeanBuffer = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VectorMeanBuffer): Seq[Double] =
    if (b.n == 0L) Seq.fill(dim)(0.0) else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VectorMeanBuffer] = Encoders.product[VectorMeanBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
