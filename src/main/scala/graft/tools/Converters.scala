package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest converters (SURVEY §2.1 S6/S7, §2.2 K3): external formats →
  * the engine's parquet-first tables.
  */
object Converters {

  /** S7 — COCO-style annotation JSON → image-caption DataFrame (reference
    * tools/Conversions.Coco2ImageCaptionFile, Conversions.scala:31-87).
    *
    * The reference flatMaps row objects by hand and hash-joins pair RDDs;
    * here both nested arrays explode declaratively and Catalyst plans the
    * equi-join (broadcast for small image lists) — output schema matches
    * Conversions.scala:69-75: (id, height, width, file, url, caption).
    */
  def cocoToImageCaptions(spark: SparkSession, jsonPath: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(jsonPath)
    val images = raw.select(explode(col("images")).as("im"))
      .select(col("im.id").as("id"), col("im.height").cast(IntegerType).as("height"),
        col("im.width").cast(IntegerType).as("width"),
        col("im.file_name").as("file"), col("im.coco_url").as("url"))
    val captions = raw.select(explode(col("annotations")).as("an"))
      .select(col("an.image_id").as("image_id"), col("an.caption").as("caption"))
    images.join(captions, col("id") === col("image_id"))
      .select("id", "height", "width", "file", "url", "caption")
  }

  /** S6 — label file + binary payload dir → (SampleID, label, data)
    * (reference tools/Binary2DataFrame.scala:32-87: lines of
    * `<filename> <label> [id]`, per-partition HDFS reads).
    *
    * Spark-native: the `binaryFile` source scans payloads (path, content)
    * and joins the parsed label lines on file name — no hand-rolled
    * per-partition IO, and both sides partition/scale independently.
    */
  def binaryToDataFrame(spark: SparkSession, labelFile: String, binaryDir: String): DataFrame = {
    val labels = spark.read.text(labelFile)
      .select(split(col("value"), "\\s+").as("p"))
      .select(col("p")(0).as("file_name"),
        col("p")(1).cast(IntegerType).as("label"),
        coalesce(col("p")(2), col("p")(0)).as("SampleID"))
    val bins = spark.read.format("binaryFile").load(binaryDir)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        col("content").as("data"))
    labels.join(bins, "file_name")
      .select("SampleID", "label", "data")
  }

  /** K3-equivalent sink: any converter output → parquet table dir. */
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S3/K3 — SequenceFile compatibility path (reference
    * SeqImageDataSource.scala:24-67 reader, Binary2Sequence.scala:56-73
    * writer): (SampleID, label, data) ↔ Hadoop SequenceFile of
    * (BytesWritable utf8 "id\tlabel", BytesWritable payload). Kept only for
    * interop with reference-era data; parquet is the native format.
    */
  def writeSequenceFile(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io.BytesWritable
    df.select("SampleID", "label", "data").rdd.map { r =>
      val key = s"${r.getString(0)}\t${r.getInt(1)}".getBytes("UTF-8")
      (new BytesWritable(key), new BytesWritable(r.getAs[Array[Byte]](2)))
    }.saveAsSequenceFile(path)
  }

  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.BytesWritable
    import spark.implicits._
    spark.sparkContext.sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) =>
        val parts = new String(k.copyBytes(), "UTF-8").split("\t", 2)
        (parts(0), parts(1).toInt, v.copyBytes())
      }.toDF("SampleID", "label", "data")
  }

  /** K2 — test-result sink (reference CaffeOnSpark.scala:63-79: blob→mean
    * map written as a text file): metrics map → single JSON file dir.
    */
  def writeMetrics(spark: SparkSession, metrics: Map[String, Seq[Double]], path: String): Unit = {
    import spark.implicits._
    val json = metrics.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k": [${v.mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    Seq(json).toDF("value").coalesce(1).write.mode("overwrite").text(path)
  }
}
