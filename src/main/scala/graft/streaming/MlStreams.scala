package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Streaming twins of the model-lifecycle forward passes: featurization
  * (M3) is select-only column arithmetic — the weights ride the plan as
  * literals (the broadcast-equivalent for O(k·dim) constants) — so the
  * SAME implementation the batch path uses runs unchanged over an
  * unbounded source. This is continuous inference over an ingest stream:
  * train at a checkpoint (batch, q87's surface), deploy the snapshot,
  * featurize everything that lands. No state, no watermark — per-row
  * map; the micro-batch boundary is invisible by construction
  * (StreamingSpec pins streamed ≡ batch row-for-row for both heads).
  */
object MlStreams {

  /** The embeddings-table stream schema (vec_id, label, embedding). */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Binary head (M3): (SampleID, ip1, prob) over a streaming frame. */
  def features(stream: DataFrame, dim: Int, weights: Array[Double],
      idCol: String = "vec_id", featCol: String = "embedding"): DataFrame =
    new graft.ml.LogisticRegression(dim).features(stream, idCol, featCol, weights)

  /** Multi-output softmax head (M3, k classes): (SampleID, ip1 = k
    * logits, prob = k-way softmax) over a streaming frame.
    */
  def softmaxFeatures(stream: DataFrame, dim: Int, numClasses: Int,
      weights: Array[Double], idCol: String = "vec_id",
      featCol: String = "embedding"): DataFrame =
    new graft.ml.SoftmaxRegression(dim, numClasses)
      .features(stream, idCol, featCol, weights)
}
