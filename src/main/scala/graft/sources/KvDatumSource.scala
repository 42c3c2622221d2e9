package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, FileInputStream, FileOutputStream}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
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
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters {
      // column pruning reaches the decoder: a count()/id-only scan skips
      // the protobuf parse and the CHW reorder entirely (the `data` copy
      // is the dominant per-row cost for image payloads)
      private var required: StructType = KvDatumSource.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // id-bound pushdown — THE payoff of key-range partitioning: the
      // store is key-sorted, so an id predicate clips whole partitions at
      // planning time and stops readers at the upper bound instead of
      // exhausting their entry budget (LMDB cursors give the same).
      // Bounds are unsigned-byte-order on the utf8 id, matching KvStore.
      private var lower: Array[Byte] = _ // inclusive; null = begin
      private var upper: Array[Byte] = _ // inclusive; null = end
      private var pushed: Array[sources.Filter] = Array.empty

      override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
        val (accepted, rest) = filters.partition {
          case sources.EqualTo("id", _: String) => true
          case sources.GreaterThan("id", _: String) => true
          case sources.GreaterThanOrEqual("id", _: String) => true
          case sources.LessThan("id", _: String) => true
          case sources.LessThanOrEqual("id", _: String) => true
          case sources.StringStartsWith("id", _) => true
          case _ => false
        }
        def bytes(v: Any) = v.asInstanceOf[String].getBytes("UTF-8")
        def tightenLower(b: Array[Byte]): Unit =
          if (lower == null || KvStore.compare(b, lower) > 0) lower = b
        def tightenUpper(b: Array[Byte]): Unit =
          if (upper == null || KvStore.compare(b, upper) < 0) upper = b
        accepted.foreach {
          case sources.EqualTo(_, v: String) =>
            tightenLower(bytes(v)); tightenUpper(bytes(v))
          case sources.GreaterThan(_, v: String) => tightenLower(bytes(v))
          case sources.GreaterThanOrEqual(_, v: String) => tightenLower(bytes(v))
          case sources.LessThan(_, v: String) => tightenUpper(bytes(v))
          case sources.LessThanOrEqual(_, v: String) => tightenUpper(bytes(v))
          case sources.StringStartsWith(_, p) =>
            // prefix range: [p, p ++ 0xFF] in unsigned byte order
            tightenLower(bytes(p)); tightenUpper(bytes(p) :+ 0xFF.toByte)
          case _ => ()
        }
        pushed = accepted
        // strict bounds (GreaterThan/LessThan) are widened to inclusive
        // ranges here, so Spark must keep evaluating every filter
        rest ++ accepted
      }
      override def pushedFilters(): Array[sources.Filter] = pushed

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      /** LmdbRDD.getPartitions semantics: ceil-split the key space into
        * ranges by walking it once and recording start keys — skipping
        * records outside the pushed id bounds, so a tight predicate plans
        * fewer, denser partitions.
        */
      override def planInputPartitions(): Array[InputPartition] = {
        def inBounds(k: Array[Byte]): Boolean =
          (lower == null || KvStore.compare(k, lower) >= 0) &&
            (upper == null || KvStore.compare(k, upper) <= 0)
        var n = 0L
        locally {
          val it = KvStore.iterate(path)
          try while (it.hasNext) { if (inBounds(it.next()._1)) n += 1 }
          finally it.close()
        }
        if (n == 0) return Array(KvRangePartition(0, null, 0, 0L, upper))
        val partSize = math.ceil(n.toDouble / numPartitions).toInt
        val starts = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
        var i = 0L
        val it = KvStore.iterate(path)
        try {
          while (it.hasNext) {
            val off = it.nextRecordOffset
            val (k, _) = it.next()
            if (inBounds(k)) {
              if (i % partSize == 0) starts += ((k, off))
              i += 1
            }
          }
        } finally it.close()
        starts.zipWithIndex
          .map { case ((k, off), idx) =>
            KvRangePartition(idx, k, partSize, off, upper): InputPartition }
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new KvDatumReaderFactory(path, required.fieldNames)
    }
}

/** A key-range partition: start key (null = begin) + entry budget, plus the
  * planner-recorded byte offset of the start key — an O(1) positioning hint
  * the reader validates (and discards, falling back to the key scan) if the
  * store changed after planning. The KEY remains the partition's identity.
  * `stopAfter` carries the pushed inclusive upper id bound (null = none):
  * keys are sorted, so the reader ends at the first key past it instead of
  * exhausting its entry budget.
  */
private[sources] case class KvRangePartition(
    index: Int, startKey: Array[Byte], size: Int, startOffset: Long,
    stopAfter: Array[Byte])
    extends InputPartition

private[sources] class KvDatumReaderFactory(path: String, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvRangePartition]
    // pruning decisions hoisted out of the row loop
    val needsDatum = fields.exists(_ != "id")
    val needsData = fields.contains("data")
    new PartitionReader[InternalRow] {
      private val it = KvStore.seekAt(path, p.startKey, p.startOffset)
      private var read = 0
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (read >= p.size || !it.hasNext) return false
        val (k, v) = it.next()
        if (p.stopAfter != null && KvStore.compare(k, p.stopAfter) > 0) {
          it.close() // sorted keys: nothing further can match
          return false
        }
        read += 1
        val d = if (needsDatum) Datum.parse(v) else null
        val mat =
          if (!needsData) null
          else if (d.encoded || d.channels <= 1) d.data
          else graft.multimodal.Multimodal.chwToHwc(d.data, d.channels, d.height, d.width)
        row = new GenericInternalRow(fields.map[Any] {
          case "id" => UTF8String.fromBytes(k)
          case "label" => UTF8String.fromString(d.label.toString)
          case "channels" => d.channels
          case "height" => d.height
          case "width" => d.width
          case "encoded" => d.encoded
          case "data" => mat
        })
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = it.close()
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

  /** Closeable record iterator. Closes its stream on EOF, but callers that
    * stop early (a partition reader that exhausts its entry budget) MUST
    * call [[close]] — every reader task otherwise leaks an open handle.
    * Tracks the byte offset of the record `next()` would return so the
    * planner can hand readers an offset hint instead of forcing a scan
    * from the start of the file.
    */
  final class KvIterator private[KvStore] (f: java.io.File, startOffset: Long)
      extends Iterator[(Array[Byte], Array[Byte])] with java.io.Closeable {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
    private var closed = false
    private var pos = 0L
    locally {
      var toSkip = startOffset
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s <= 0) throw new EOFException(s"offset $startOffset past end of $f")
        toSkip -= s
      }
      pos = startOffset
    }
    private var recOffset = pos
    private var nextRec: (Array[Byte], Array[Byte]) = advance()

    private def readVarint(): Int = {
      var shift = 0; var res = 0; var b = 0
      do {
        b = in.readUnsignedByte(); pos += 1
        res |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    private def advance(): (Array[Byte], Array[Byte]) = {
      if (closed) return null
      recOffset = pos
      try {
        val kl = readVarint()
        val k = new Array[Byte](kl); in.readFully(k); pos += kl
        val vl = readVarint()
        val v = new Array[Byte](vl); in.readFully(v); pos += vl
        (k, v)
      } catch { case _: EOFException => close(); null }
    }
    /** Key of the record `next()` would return (null when exhausted). */
    def peekKey: Array[Byte] = if (nextRec == null) null else nextRec._1
    /** File offset of the record `next()` would return. */
    def nextRecordOffset: Long = recOffset
    override def hasNext: Boolean = nextRec != null
    override def next(): (Array[Byte], Array[Byte]) = {
      val r = nextRec; nextRec = advance(); r
    }
    override def close(): Unit = if (!closed) { closed = true; in.close() }
  }

  def iterate(dir: String): KvIterator = {
    val f = new java.io.File(dir, File)
    if (!f.exists())
      // zero-length store: an iterator over an empty temp-free path — model
      // it as an immediately-exhausted iterator on a real empty file
      return new KvIterator(emptyFile(), 0L)
    new KvIterator(f, 0L)
  }

  private def emptyFile(): java.io.File = {
    val f = java.io.File.createTempFile("kv_empty", ".kv")
    f.deleteOnExit()
    f
  }

  /** Iterator positioned at the first key ≥ `startKey` (null = begin) by
    * linear scan. Still closeable — early-stopping callers must close it.
    */
  def seek(dir: String, startKey: Array[Byte]): KvIterator = {
    val it = iterate(dir)
    if (startKey != null)
      while (it.hasNext && compare(it.peekKey, startKey) < 0) it.next()
    it
  }

  /** Iterator positioned at `startKey` using a byte-offset hint recorded at
    * planning time — O(1) skip instead of a scan from the file start. The
    * first key is validated against the hint; if the store changed between
    * planning and read the reader falls back to the key scan.
    */
  def seekAt(dir: String, startKey: Array[Byte], offsetHint: Long): KvIterator = {
    if (startKey == null || offsetHint <= 0) return seek(dir, startKey)
    val f = new java.io.File(dir, File)
    if (f.exists() && offsetHint < f.length()) {
      // a stale offset lands mid-record: the probe parse can fail in
      // arbitrary ways (EOF, bogus varint length), all of which mean
      // "hint invalid — scan instead"
      val hinted = try new KvIterator(f, offsetHint)
        catch { case scala.util.control.NonFatal(_) => null }
      if (hinted != null) {
        if (hinted.hasNext && compare(hinted.peekKey, startKey) == 0) return hinted
        hinted.close()
      }
    }
    seek(dir, startKey)
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
}
