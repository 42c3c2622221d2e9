package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Caffe `Datum` record (P9) — the value type of the reference's LMDB
  * databases (reference LmdbRDD.scala:136-151 decodes it per entry).
  *
  * The message layout is the public BVLC caffe.proto:
  * {{{
  *   message Datum {
  *     optional int32 channels   = 1;
  *     optional int32 height     = 2;
  *     optional int32 width      = 3;
  *     optional bytes data       = 4;
  *     optional int32 label      = 5;
  *     repeated float float_data = 6;
  *     optional bool  encoded    = 7;
  *   }
  * }}}
  * No protobuf library ships in this environment, so the codec below speaks
  * the (public, stable) protobuf wire format directly: varint-keyed fields,
  * wire types 0 (varint), 1 (64-bit), 2 (length-delimited), 5 (32-bit).
  * `float_data` accepts both packed (wire 2) and unpacked (wire 5)
  * encodings, as any conforming parser must. Unknown fields are skipped.
  */
final case class Datum(
    channels: Int = 0,
    height: Int = 0,
    width: Int = 0,
    data: Array[Byte] = Array.emptyByteArray,
    label: Int = 0,
    floatData: Array[Float] = Array.empty,
    encoded: Boolean = false)

object Datum {

  def parse(bytes: Array[Byte]): Datum = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var res = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        res |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def le32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    var d = Datum()
    val floats = ArrayBuffer.empty[Float]
    while (pos < bytes.length) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => d = d.copy(channels = varint().toInt)
        case (2, 0) => d = d.copy(height = varint().toInt)
        case (3, 0) => d = d.copy(width = varint().toInt)
        case (4, 2) =>
          val len = varint().toInt
          d = d.copy(data = java.util.Arrays.copyOfRange(bytes, pos, pos + len))
          pos += len
        case (5, 0) => d = d.copy(label = varint().toInt)
        case (6, 5) => floats += java.lang.Float.intBitsToFloat(le32())
        case (6, 2) =>
          val len = varint().toInt
          val end = pos + len
          while (pos < end) floats += java.lang.Float.intBitsToFloat(le32())
        case (7, 0) => d = d.copy(encoded = varint() != 0)
        case (_, 0) => varint() // skip unknown varint
        case (_, 1) => pos += 8
        case (_, 2) => pos += varint().toInt
        case (_, 5) => pos += 4
        case (f, w) => throw new IllegalArgumentException(s"bad wire type $w for field $f")
      }
    }
    d.copy(floatData = floats.toArray)
  }

  /** Wire-format encoder (fixture/writer side; packed float_data). */
  def encode(d: Datum): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      out += v.toByte
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    if (d.channels != 0) { key(1, 0); varint(d.channels) }
    if (d.height != 0) { key(2, 0); varint(d.height) }
    if (d.width != 0) { key(3, 0); varint(d.width) }
    if (d.data.nonEmpty) { key(4, 2); varint(d.data.length); out ++= d.data }
    if (d.label != 0) { key(5, 0); varint(d.label) }
    if (d.floatData.nonEmpty) {
      key(6, 2); varint(4L * d.floatData.length)
      d.floatData.foreach { f =>
        val v = java.lang.Float.floatToIntBits(f)
        out += v.toByte; out += (v >> 8).toByte
        out += (v >> 16).toByte; out += (v >> 24).toByte
      }
    }
    if (d.encoded) { key(7, 0); varint(1) }
    out.toArray
  }
}
