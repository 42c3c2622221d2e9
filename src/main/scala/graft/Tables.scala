package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-first table loaders over the driver-generated testdata layout
  * (TESTDATA.md): one parquet file per table under an sf directory.
  *
  * Mirrors the reference's DataFrame source idea
  * (caffe-grid/src/main/scala/com/yahoo/ml/caffe/DataFrameSource.scala:83-88 —
  * "input DataFrame format is configurable, default parquet") without the
  * prototxt indirection: the format is parquet, the path is `dir/name.parquet`,
  * and Catalyst sees a plain relation so pushdown/pruning stay automatic.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
