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

  // Plan-fragment cache: repeated loads of the same table otherwise re-list
  // the directory and re-read parquet footers on every query — measurable
  // when a bench run plans 38 queries back to back. Keyed per session so
  // Verify/Bench/test sessions don't cross.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright —
    // read it as a long and rebuild a microsecond timestamp (the generator
    // emits exact-µs values, verified ns % 1000 == 0, so this is lossless).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))))
        .getOrElse(df)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
