package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, FileInputStream, FileOutputStream}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2 — the reference's LMDB ingest (LmdbRDD.scala:36-155) rebuilt as a
  * DataSource V2 over a sorted key→Datum store.
  *
  * The environment ships no LMDB library, so the storage layer is a minimal
  * sorted-KV file ([[KvStore]], one varint-framed file, keys in unsigned
  * byte order — the iteration contract LMDB's B-tree gives). Everything
  * above the storage layer IS the reference's design, re-expressed for
  * DSv2:
  *
  *   - `planInputPartitions` mirrors LmdbRDD.getPartitions:41-95 — count
  *     entries, part_size = ceil(n / numPartitions), then one walk of the
  *     key space recording each partition's START KEY. Partitions are
  *     key RANGES, not byte offsets: any store that can seek a key (LMDB
  *     cursor, RocksDB iterator, this file) can serve them, and re-planning
  *     is stable under compaction.
  *   - each PartitionReader seeks its start key and reads part_size
  *     entries, decoding the protobuf [[Datum]] value and applying the
  *     CHW→HWC reorder for raw (non-encoded) multi-channel payloads
  *     (LmdbRDD.compute:99-155, LMDBdata2Matdata:270-281 — the repo's
  *     shared kernel `Multimodal.chwToHwc` does the reorder).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.KvDatumSource")
  *     .option("path", dir).option("numPartitions", "8").load()
  * }}}
  */
class KvDatumSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvDatumSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "option 'path' is required")
    val parts = Option(properties.get("numPartitions")).map(_.toInt).getOrElse(4)
    new KvDatumTable(path, parts)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object KvDatumSource {
  /** The reference's sample tuple (id, label, channels, height, width,
    * encoded, data) — LmdbRDD.scala:37.
    */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("encoded", BooleanType, nullable = false),
    StructField("data", BinaryType, nullable = true)))
}

private[sources] class KvDatumTable(path: String, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"kvdatum:$path"
  override def schema(): StructType = KvDatumSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = KvDatumSource.schema
      override def toBatch: Batch = this

      /** LmdbRDD.getPartitions semantics: ceil-split the key space into
        * ranges by walking it once and recording start keys.
        */
      override def planInputPartitions(): Array[InputPartition] = {
        val n = KvStore.count(path)
        if (n == 0) return Array(KvRangePartition(0, null, 0))
        val partSize = math.ceil(n.toDouble / numPartitions).toInt
        val starts = scala.collection.mutable.ArrayBuffer[Array[Byte]](null)
        var i = 0L
        val it = KvStore.iterate(path)
        while (it.hasNext) {
          val (k, _) = it.next()
          if (i > 0 && i % partSize == 0) starts += k
          i += 1
        }
        starts.zipWithIndex
          .map { case (k, idx) => KvRangePartition(idx, k, partSize): InputPartition }
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new KvDatumReaderFactory(path)
    }
}

/** A key-range partition: start key (null = begin) + entry budget. */
private[sources] case class KvRangePartition(
    index: Int, startKey: Array[Byte], size: Int) extends InputPartition

private[sources] class KvDatumReaderFactory(path: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvRangePartition]
    new PartitionReader[InternalRow] {
      private val it = KvStore.seek(path, p.startKey)
      private var read = 0
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (read >= p.size || !it.hasNext) return false
        val (k, v) = it.next()
        read += 1
        val d = Datum.parse(v)
        val mat =
          if (d.encoded || d.channels <= 1) d.data
          else graft.multimodal.Multimodal.chwToHwc(d.data, d.channels, d.height, d.width)
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(k), UTF8String.fromString(d.label.toString),
          d.channels, d.height, d.width, d.encoded, mat))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Minimal sorted key-value store: one varint-framed file, keys unique and
  * sorted in unsigned byte order (LMDB's iteration order). Stands in for
  * the B-tree; [[seek]] is a linear scan here where LMDB descends the tree
  * — the partition-planning and reader contracts above don't care.
  */
object KvStore {
  private val File = "data.kv"

  def write(dir: String, records: Seq[(Array[Byte], Array[Byte])]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val sorted = records.sortWith((a, b) => compare(a._1, b._1) < 0)
    val out = new BufferedOutputStream(new FileOutputStream(new java.io.File(d, File)))
    try sorted.foreach { case (k, v) =>
      writeVarint(out, k.length); out.write(k)
      writeVarint(out, v.length); out.write(v)
    } finally out.close()
  }

  def count(dir: String): Long = {
    var n = 0L
    val it = iterate(dir)
    while (it.hasNext) { it.next(); n += 1 }
    n
  }

  def iterate(dir: String): Iterator[(Array[Byte], Array[Byte])] = {
    val f = new java.io.File(dir, File)
    if (!f.exists()) return Iterator.empty
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
    new Iterator[(Array[Byte], Array[Byte])] {
      private var nextRec: (Array[Byte], Array[Byte]) = advance()
      private def advance(): (Array[Byte], Array[Byte]) =
        try {
          val kl = readVarint(in)
          val k = new Array[Byte](kl); in.readFully(k)
          val vl = readVarint(in)
          val v = new Array[Byte](vl); in.readFully(v)
          (k, v)
        } catch { case _: EOFException => in.close(); null }
      override def hasNext: Boolean = nextRec != null
      override def next(): (Array[Byte], Array[Byte]) = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Iterator positioned at the first key ≥ `startKey` (null = begin). */
  def seek(dir: String, startKey: Array[Byte]): Iterator[(Array[Byte], Array[Byte])] = {
    val it = iterate(dir)
    if (startKey == null) it
    else it.dropWhile { case (k, _) => compare(k, startKey) < 0 }
  }

  /** Unsigned lexicographic byte order — LMDB's default key order. */
  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def writeVarint(out: java.io.OutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }
  private def readVarint(in: DataInputStream): Int = {
    var shift = 0; var res = 0; var b = 0
    do {
      b = in.readUnsignedByte()
      res |= (b & 0x7f) << shift; shift += 7
    } while ((b & 0x80) != 0)
    res
  }
}
