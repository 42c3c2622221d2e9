package graft

import graft.tools.Converters
import java.nio.file.{Files, Paths}

/** Converter tests mirroring the reference's ToolTest fixtures:
  * COCO JSON → image-caption DF (ToolTest.scala:84-134 input side) and
  * label-file + binaries → DF with row count == label lines
  * (ToolTest.scala:35-55).
  */
class ConvertersSpec extends SparkSpec {

  test("coco-style json explodes to image-caption rows joined by image id") {
    val dir = Files.createTempDirectory("coco")
    val json =
      """{"images": [
        |   {"id": 1, "height": 480, "width": 640, "file_name": "a.jpg", "coco_url": "http://x/a.jpg"},
        |   {"id": 2, "height": 240, "width": 320, "file_name": "b.jpg", "coco_url": "http://x/b.jpg"}],
        | "annotations": [
        |   {"image_id": 1, "id": 10, "caption": "a cat"},
        |   {"image_id": 1, "id": 11, "caption": "a black cat"},
        |   {"image_id": 2, "id": 12, "caption": "a dog"}]}""".stripMargin
    Files.writeString(dir.resolve("coco.json"), json)
    val df = Converters.cocoToImageCaptions(spark, dir.resolve("coco.json").toString)
    assert(df.columns.toSeq == Seq("id", "height", "width", "file", "url", "caption"))
    assert(df.count() == 3)
    assert(df.filter("id = 1").count() == 2)
    val r = df.filter("id = 2").head
    assert(r.getAs[String]("file") == "b.jpg" && r.getAs[String]("caption") == "a dog")
  }

  test("binary ingest: row count equals label-file line count, bytes intact") {
    val dir = Files.createTempDirectory("bins")
    val payloadDir = dir.resolve("payloads")
    Files.createDirectory(payloadDir)
    Files.write(payloadDir.resolve("img1.bin"), Array[Byte](1, 2, 3))
    Files.write(payloadDir.resolve("img2.bin"), Array[Byte](4, 5))
    Files.writeString(dir.resolve("labels.txt"),
      "img1.bin 7 s1\nimg2.bin 9 s2\n")
    val df = Converters.binaryToDataFrame(spark,
      dir.resolve("labels.txt").toString, payloadDir.toString)
    assert(df.count() == 2)
    val r1 = df.filter("SampleID = 's1'").head
    assert(r1.getAs[Int]("label") == 7)
    assert(r1.getAs[Array[Byte]]("data").toSeq == Seq[Byte](1, 2, 3))
    // K3 sink round-trip
    val out = dir.resolve("out").toString
    Converters.writeTable(df, out)
    assert(spark.read.parquet(out).count() == 2)
  }
}
