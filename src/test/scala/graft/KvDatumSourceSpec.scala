package graft

import graft.multimodal.Multimodal
import graft.sources.{Datum, KvDatumSource, KvStore}
import org.apache.spark.sql.functions._

/** S1/S2/P9: the LMDB-shaped DSv2 source over a synthetic sorted-KV dir —
  * key-range partition planning (reference LmdbRDD.getPartitions:41-95),
  * per-partition seek+read, protobuf Datum decode, CHW→HWC reorder.
  */
class KvDatumSourceSpec extends SparkSpec {

  test("Datum codec round-trips through the protobuf wire format") {
    val d = Datum(channels = 3, height = 4, width = 5, data = Array.tabulate(60)(_.toByte),
      label = 7, floatData = Array(1.5f, -2.25f, 0f), encoded = false)
    val back = Datum.parse(Datum.encode(d))
    assert(back.channels == 3 && back.height == 4 && back.width == 5)
    assert(back.label == 7 && !back.encoded)
    assert(back.data.toSeq == d.data.toSeq)
    assert(back.floatData.toSeq == Seq(1.5f, -2.25f, 0f))
  }

  test("Datum parser accepts unpacked float_data and skips unknown fields") {
    // field 6 unpacked (wire 5): tag = 6<<3 | 5 = 0x35; 1.0f LE = 00 00 80 3f
    // unknown field 99 varint:   tag = 99<<3 | 0 = 0x318 → varint 0x98 0x06
    val bytes = Array[Int](
      0x08, 0x01, // channels = 1
      0x35, 0x00, 0x00, 0x80, 0x3f, // float_data += 1.0f
      0x98, 0x06, 0x2a, // field 99 = 42 (skipped)
      0x28, 0x09 // label = 9
    ).map(_.toByte)
    val d = Datum.parse(bytes)
    assert(d.channels == 1 && d.label == 9 && d.floatData.toSeq == Seq(1.0f))
  }

  private def writeFixture(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("kvdatum").toString
    // CHW payload: value = plane index, so HWC output interleaves 0,1,2
    val records = (0 until n).map { i =>
      val chw = Array.tabulate(3 * 2 * 2)(p => (p / 4).toByte)
      val d = Datum(channels = 3, height = 2, width = 2, data = chw,
        label = i % 10, encoded = false)
      (f"key$i%05d".getBytes("UTF-8"), Datum.encode(d))
    }
    // write unsorted to prove the store sorts on write like LMDB's B-tree
    KvStore.write(dir, scala.util.Random.shuffle(records))
    dir
  }

  test("key-range planning: ceil split, every partition a contiguous key range") {
    val dir = writeFixture(103)
    val df = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).option("numPartitions", "4").load()
    assert(df.count() == 103)
    // ceil(103/4) = 26 → partitions of 26/26/26/25
    val sizes = df.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sizes == Seq(25, 26, 26, 26))
    // contiguity: per-partition [min,max] key ranges do not overlap
    val ranges = df.groupBy(spark_partition_id().as("p"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("lo").collect()
    val ordered = ranges.sliding(2).forall {
      case Array(a, b) => a.getString(2) < b.getString(1)
      case _ => true
    }
    assert(ordered, "partition key ranges overlap")
  }

  test("rows decode Datum fields and reorder CHW→HWC like the shared kernel") {
    val dir = writeFixture(10)
    val rows = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).option("numPartitions", "2").load()
      .orderBy("id").collect()
    assert(rows.length == 10)
    val r = rows.head
    assert(r.getString(0) == "key00000" && r.getString(1) == "0")
    assert(r.getInt(2) == 3 && r.getInt(3) == 2 && r.getInt(4) == 2 && !r.getBoolean(5))
    val hwc = r.getAs[Array[Byte]](6)
    val expected = Multimodal.chwToHwc(
      Array.tabulate(12)(p => (p / 4).toByte), 3, 2, 2)
    assert(hwc.toSeq == expected.toSeq)
    assert(hwc.take(6).toSeq == Seq[Byte](0, 1, 2, 0, 1, 2)) // interleaved planes
  }

  test("seekAt honors a valid offset hint and falls back when the hint is stale") {
    val dir = writeFixture(50)
    // harvest (key, offset) pairs the way the planner does
    val pairs = {
      val it = KvStore.iterate(dir)
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
        while (it.hasNext) {
          val off = it.nextRecordOffset
          val (k, _) = it.next()
          buf += ((k, off))
        }
        buf.toSeq
      } finally it.close()
    }
    val (k20, off20) = pairs(20)
    // valid hint: positioned exactly at key 20
    val hinted = KvStore.seekAt(dir, k20, off20)
    try {
      assert(new String(hinted.next()._1, "UTF-8") == "key00020")
    } finally hinted.close()
    // stale hint (points mid-record): falls back to the key scan
    val stale = KvStore.seekAt(dir, k20, off20 + 1)
    try {
      assert(new String(stale.next()._1, "UTF-8") == "key00020")
    } finally stale.close()
  }

  test("early-stopped partition readers do not leak file handles") {
    val dir = writeFixture(64)
    def openHandles(): Int = {
      val fdDir = java.nio.file.Paths.get("/proc/self/fd")
      val s = java.nio.file.Files.list(fdDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count { p =>
          try java.nio.file.Files.readSymbolicLink(p).toString.contains(dir)
          catch { case _: Exception => false }
        }
      } finally s.close()
    }
    // 8 partitions → 7 readers stop on their size budget mid-file; each
    // used to leave its FileInputStream open until GC
    val n = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).option("numPartitions", "8").load().count()
    assert(n == 64)
    assert(openHandles() == 0,
      "partition readers left open handles on the KV store file")
  }

  test("column pruning reaches the scan: id-only reads skip the Datum decode") {
    val dir = writeFixture(30)
    val df = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).option("numPartitions", "3").load()
    val idOnly = df.select("id")
    // the pruned schema must reach the DSv2 scan, not a post-scan project:
    // the BatchScan's output column list holds only id
    val scan = idOnly.queryExecution.executedPlan.toString
    val scanLine = scan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert("""\[id#\d+\]""".r.findFirstIn(scanLine).isDefined, scanLine)
    assert(!scanLine.contains("data#"), scanLine)
    assert(idOnly.count() == 30)
    assert(idOnly.orderBy("id").head.getString(0) == "key00000")
    // and a metadata-only projection decodes the Datum but skips the pixels
    val dims = df.select("id", "channels", "height", "width").orderBy("id").head
    assert(dims.getInt(1) == 3 && dims.getInt(2) == 2 && dims.getInt(3) == 2)
  }

  test("id predicates push into key-range planning and stop readers early") {
    val dir = writeFixture(100)
    val df = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).option("numPartitions", "4").load()
    // range predicate: exactly keys 00020..00029 + 00030
    val ranged = df.filter(col("id") >= "key00020" && col("id") <= "key00030")
    assert(ranged.count() == 11)
    assert(ranged.orderBy("id").collect().map(_.getString(0)).toSeq ==
      (20 to 30).map(i => f"key$i%05d"))
    // prefix predicate
    val prefixed = df.filter(col("id").startsWith("key0009"))
    assert(prefixed.count() == 10)
    // the pushed bounds shrink the PLANNED row budget: 11 in-bounds rows
    // across 4 partitions = ceil sizes, not 100-row budgets
    val parts = ranged.rdd.getNumPartitions
    assert(parts <= 4)
    val sizes = ranged.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.sum == 11 && sizes.max <= 3, sizes.toSeq.toString)
    // equality collapses to a single-key range
    assert(df.filter(col("id") === "key00042").count() == 1)
    // contradictory bounds plan an empty scan, not an error
    assert(df.filter(col("id") > "key00050" && col("id") < "key00010").count() == 0)
  }

  test("encoded payloads pass through undecoded (reference keeps them for Mat.decode)") {
    val dir = java.nio.file.Files.createTempDirectory("kvenc").toString
    val payload = Array[Byte](9, 8, 7)
    KvStore.write(dir, Seq(("a".getBytes, Datum.encode(
      Datum(channels = 3, data = payload, encoded = true)))))
    val r = spark.read.format("graft.sources.KvDatumSource")
      .option("path", dir).load().head()
    assert(r.getBoolean(5) && r.getAs[Array[Byte]](6).toSeq == payload.toSeq)
  }
}
