package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stand-in receiving the reference's deprecated Java `Pair` SequenceFile
  * key (two default-serialized Object fields named first/second): the
  * stream's class descriptor is swapped for this class's at read time, so
  * the field layouts must stay identical — two Object fields, no
  * primitives, no custom writeObject.
  */
@SerialVersionUID(1L)
final class PairKey extends Serializable {
  var first: AnyRef = _
  var second: AnyRef = _
}

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

  /** Deserialization allowlist for SequenceFile keys: the three legitimate
    * key shapes and their members, everything else rejected — reference-era
    * files are untrusted input and a raw readObject is a gadget-chain
    * execution surface.
    */
  private val sampleKeyFilter: java.io.ObjectInputFilter =
    java.io.ObjectInputFilter.Config.createFilter(
      "maxdepth=5;graft.tools.PairKey;scala.Tuple2;scala.Tuple6;java.lang.*;!*")

  /** Key decoder stream: any class named `*.Pair` in the stream (the
    * reference's deprecated Java key class, a plain two-Object-field
    * default-serialized shape — SeqImageDataSource.scala:40-44) has its
    * descriptor swapped for [[PairKey]], which declares the identical field
    * layout, so Pair-keyed files decode without the original class on the
    * classpath.
    */
  private def sampleKeyStream(kb: Array[Byte]): java.io.ObjectInputStream = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(kb)) {
      override def readClassDescriptor(): java.io.ObjectStreamClass = {
        val d = super.readClassDescriptor()
        if (d.getName != null && d.getName.endsWith(".Pair"))
          java.io.ObjectStreamClass.lookup(classOf[PairKey])
        else d
      }
    }
    ois.setObjectInputFilter(sampleKeyFilter)
    ois
  }

  /** S3 full-fidelity reader: the reference accepts THREE key encodings in
    * one SequenceFile scan (SeqImageDataSource.scala:36-63) — the
    * deprecated Java `Pair` class (decoded here by descriptor substitution
    * into [[PairKey]]), a Java-serialized Tuple2 (id, label), a
    * Java-serialized Tuple6 (id, label, channels, height, width, encoded),
    * plus this repo's native utf8 "id\tlabel". Pair/Tuple2 keys default
    * (channels=1, height=0, width=0, encoded=true); Tuple6 carries explicit
    * dims — reference defaults at SeqImageDataSource.scala:30-35.
    */
  def readSequenceFileSamples(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.BytesWritable
    import spark.implicits._
    spark.sparkContext.sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) =>
        val kb = k.copyBytes()
        val payload = if (v == null) null else v.copyBytes()
        // Java serialization stream magic 0xACED
        if (kb.length >= 2 && kb(0) == 0xAC.toByte && kb(1) == 0xED.toByte) {
          val ois = sampleKeyStream(kb)
          try ois.readObject() match {
            case pk: PairKey =>
              (String.valueOf(pk.first), String.valueOf(pk.second), 1, 0, 0, true, payload)
            case p: Product if p.productArity == 2 =>
              (p.productElement(0).asInstanceOf[String],
                p.productElement(1).asInstanceOf[String], 1, 0, 0, true, payload)
            case p: Product if p.productArity == 6 =>
              (p.productElement(0).asInstanceOf[String],
                p.productElement(1).asInstanceOf[String],
                p.productElement(2).asInstanceOf[Int],
                p.productElement(3).asInstanceOf[Int],
                p.productElement(4).asInstanceOf[Int],
                p.productElement(5).asInstanceOf[Boolean], payload)
            case other =>
              throw new IllegalArgumentException(s"unsupported key ${other.getClass}")
          } finally ois.close()
        } else {
          val parts = new String(kb, "UTF-8").split("\t", 2)
          (parts(0), parts(1), 1, 0, 0, true, payload)
        }
      }.toDF("id", "label", "channels", "height", "width", "encoded", "data")
  }

  /** S3 writer twin: emit any of the three key encodings (for interop
    * round-trips and reference-era consumers).
    */
  def writeSequenceFileSamples(df: DataFrame, path: String,
      keyEncoding: String = "utf8"): Unit = {
    import org.apache.hadoop.io.BytesWritable
    def javaSer(o: AnyRef): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.toByteArray
    }
    df.select("id", "label", "channels", "height", "width", "encoded", "data").rdd.map { r =>
      val key = keyEncoding match {
        case "utf8" => s"${r.getString(0)}\t${r.getString(1)}".getBytes("UTF-8")
        case "tuple2" => javaSer((r.getString(0), r.getString(1)))
        case "tuple6" => javaSer((r.getString(0), r.getString(1), r.getInt(2),
          r.getInt(3), r.getInt(4), r.getBoolean(5)))
        case other => throw new IllegalArgumentException(s"unknown keyEncoding $other")
      }
      (new BytesWritable(key), new BytesWritable(r.getAs[Array[Byte]](6)))
    }.saveAsSequenceFile(path)
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
