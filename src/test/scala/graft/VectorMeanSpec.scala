package graft

import graft.agg.VectorMean
import org.apache.spark.sql.functions._

/** Mirrors the reference's VectorMean test
  * (caffe-grid/src/test/scala/com/yahoo/ml/caffe/DataFrameTest.scala:32-61):
  * element-wise mean vs hand-computed values, 1e-5 tolerance.
  */
class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise mean matches hand-computed values") {
    val data = Seq(
      Seq(1.0f, 10.0f),
      Seq(2.0f, 20.0f),
      Seq(3.0f, 30.0f))
    val df = data.toDF("v")
    val vm = udaf(new VectorMean(2))
    val got = df.agg(vm(col("v"))).head.getSeq[Double](0)
    assert(math.abs(got(0) - 2.0) < 1e-5)
    assert(math.abs(got(1) - 20.0) < 1e-5)
  }

  test("agrees with the exploded decimal formulation on real embeddings") {
    val emb = Tables(spark, sf, "embeddings")
    val vm = udaf(new VectorMean(64))
    val typed = emb.agg(vm(col("embedding"))).head.getSeq[Double](0)
    // q26 emits exploded (label, idx, m, n_vecs) rows; the global mean is
    // the per-(label, idx) means weighted by each group's vector count.
    val rows = queries.VectorOps.q26VectorMean.fn(spark, sf).collect()
    val weighted = Array.fill(64)(0.0)
    val counts = Array.fill(64)(0L)
    rows.foreach { r =>
      val i = r.getAs[Long]("idx").toInt
      val n = r.getAs[Long]("n_vecs")
      weighted(i) += r.getAs[Double]("m") * n
      counts(i) += n
    }
    var i = 0
    while (i < 64) {
      assert(math.abs(typed(i) - weighted(i) / counts(i)) < 1e-6, s"elem $i")
      i += 1
    }
  }
}
