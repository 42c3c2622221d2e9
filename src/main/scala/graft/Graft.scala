package graft

import graft.ml.{LogisticRegression, TrainConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing session facade — the switch-over surface for a user of
  * the reference driver (CaffeOnSpark.scala:93-443: `train`,
  * `trainWithValidation`, `test`, `features` over a DataSource).
  *
  * Shape-compatible, Spark-native:
  *   - a "source" is any DataFrame with an id column, a feature column
  *     (Array[Float]) and a label column — whatever scan produced it
  *     (parquet via [[Tables]], the LMDB-shaped DSv2 source, SequenceFile
  *     converters, …);
  *   - `train`/`trainWithValidation` run the treeAggregate gradient loop
  *     (M1/M2), returning the model weights;
  *   - `features` is the forward pass as pure column expressions (M3);
  *   - `test` aggregates per-blob means like the reference's metric map
  *     (M4);
  *   - model snapshots are parquet (K5): [[save]]/[[load]].
  *
  * The analytics/pipeline operators (dedup, similarity, text, events) are
  * library functions on DataFrames — see graft.queries.* and the
  * registered SQL functions (GraftExtensions); they need no session state.
  */
final class Graft(spark: SparkSession, dim: Int, cfg: TrainConfig = TrainConfig(),
    numClasses: Int = 2) {

  require(numClasses >= 2, s"numClasses must be >= 2, got $numClasses")

  // numClasses = 2 keeps the binary sigmoid model (single weight vector,
  // the historical surface); > 2 routes every lifecycle call to the
  // multi-output softmax head — same flattened-weights snapshot format,
  // so JobRunner's train→save→load→features/test chain is model-agnostic
  private val lr = new LogisticRegression(dim, cfg)
  private val sm =
    if (numClasses > 2) Some(new graft.ml.SoftmaxRegression(dim, numClasses, cfg))
    else None

  private def toRdd(source: DataFrame, featCol: String, labelCol: String) =
    source.select(col(featCol), col(labelCol).cast("double")).rdd
      .map(r => (r.getSeq[Float](0).toArray, r.getDouble(1)))

  /** M1 — synchronous distributed training; returns the weight vector
    * (flattened `classes × dim` matrix for the softmax head).
    */
  def train(source: DataFrame, featCol: String = "embedding",
      labelCol: String = "label"): Array[Double] = {
    val data = toRdd(source, featCol, labelCol)
    sm.fold(lr.fit(data))(_.fit(data))
  }

  /** M2 — training interleaved with validation; returns (weights, metrics
    * DataFrame(iteration, accuracy, loss)) like the reference's validation
    * output frame.
    */
  def trainWithValidation(train: DataFrame, validation: DataFrame,
      featCol: String = "embedding", labelCol: String = "label"): (Array[Double], DataFrame) = {
    val t = toRdd(train, featCol, labelCol)
    val v = toRdd(validation, featCol, labelCol)
    sm.fold(lr.fitWithValidation(spark, t, v))(_.fitWithValidation(spark, t, v))
  }

  /** M3 — forward pass: (SampleID, ip1, prob) feature frame (k-wide blobs
    * for the softmax head).
    */
  def features(source: DataFrame, weights: Array[Double],
      idCol: String = "vec_id", featCol: String = "embedding"): DataFrame =
    sm.fold(lr.features(source, idCol, featCol, weights))(
      _.features(source, idCol, featCol, weights))

  /** M4 — per-blob mean metrics, the reference's `test` result map. */
  def test(source: DataFrame, weights: Array[Double],
      idCol: String = "vec_id", featCol: String = "embedding"): Map[String, Seq[Double]] =
    sm.fold(lr.test(source, idCol, featCol, weights))(
      _.test(source, idCol, featCol, weights))

  /** K5 — model snapshot to parquet. */
  def save(weights: Array[Double], path: String): Unit =
    LogisticRegression.saveWeights(spark, weights, path)

  def load(path: String): Array[Double] =
    LogisticRegression.loadWeights(spark, path)
}
