package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (LLM-pipeline): media as opaque binary columns
  * with typed metadata, batch-oriented decode/transform stages.
  *
  * Mirrors the reference's image sample tuple
  * (id, label, channels, height, width, encoded, data — ImageDataSource
  * .scala:27-29, FIXTURES §2) as a case class with Dataset encoders, and its
  * decode/resize stage (ImageDataSource.scala:124-151, native Mat decode)
  * as per-partition batch transforms.
  *
  * Decode is REAL (javax.imageio, in the JDK): JPEG/PNG/BMP/GIF bytes →
  * interleaved HWC byte buffer, BGR channel order for color (matching the
  * reference's OpenCV Mat convention), undecodable samples skipped —
  * ImageDataSource.scala:136-151 semantics. Resize/crop/mirror/CHW kernels
  * operate on the same raw buffers.
  */
final case class MediaSample(
    id: String,
    label: String,
    channels: Int,
    height: Int,
    width: Int,
    encoded: Boolean,
    data: Array[Byte])

object Multimodal {

  /** Real image decode via javax.imageio (P7; reference
    * ImageDataSource.scala:136-151 + native Mat decode, jcaffe/Mat.java:58-76).
    *
    * `numChannels` mirrors the reference's decode-mode switch: 1 forces
    * grayscale (CV_LOAD_IMAGE_GRAYSCALE), 3 forces color
    * (CV_LOAD_IMAGE_COLOR), anything else keeps the image's own model
    * (CV_LOAD_IMAGE_UNCHANGED). Output is an interleaved HWC buffer, BGR
    * channel order for color — the OpenCV Mat layout every downstream kernel
    * (resize/crop/mirror/CHW) expects. Undecodable payloads return None and
    * are skipped by the pipeline, like the reference's "Skipped image" path.
    */
  def decode(s: MediaSample, numChannels: Int = 0): Option[MediaSample] = {
    if (!s.encoded) Some(s)
    else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(s.data))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val wantGray = numChannels match {
            case 1 => true
            case 3 => false
            case _ => img.getColorModel.getNumColorComponents == 1
          }
          val c = if (wantGray) 1 else 3
          val out = new Array[Byte](w * h * c)
          val rgbRow = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rgbRow, 0, w)
            var x = 0
            while (x < w) {
              val p = rgbRow(x)
              val r = (p >> 16) & 0xff
              val g = (p >> 8) & 0xff
              val b = p & 0xff
              if (wantGray) {
                // OpenCV BGR→GRAY weights: 0.299 R + 0.587 G + 0.114 B
                out(y * w + x) = math.round(0.299f * r + 0.587f * g + 0.114f * b).toByte
              } else {
                val off = (y * w + x) * 3
                out(off) = b.toByte
                out(off + 1) = g.toByte
                out(off + 2) = r.toByte
              }
              x += 1
            }
            y += 1
          }
          Some(MediaSample(s.id, s.label, c, h, w, encoded = false, out))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Nearest-neighbour resize over a raw HWC buffer — real kernel. */
  def resizeNearest(s: MediaSample, outW: Int, outH: Int): MediaSample = {
    require(!s.encoded, "decode before resize")
    val out = new Array[Byte](outW * outH * s.channels)
    var y = 0
    while (y < outH) {
      val sy = y * s.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * s.width / outW
        var ch = 0
        while (ch < s.channels) {
          out((y * outW + x) * s.channels + ch) =
            s.data((sy * s.width + sx) * s.channels + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    s.copy(height = outH, width = outW, data = out)
  }

  /** P7 resize, INTER_LINEAR twin of the reference's default resize path
    * (ImageDataSource.scala:134-151 → Mat.resize, jcaffe/Mat.java:58-76;
    * OpenCV resize defaults to INTER_LINEAR): textbook real-valued bilinear
    * over an HWC buffer with OpenCV's half-pixel-center source mapping
    * `f = (dst + 0.5) · src/out − 0.5`, edge-clamped, rounded half-up per
    * channel. Exact byte parity with OpenCV is NOT claimed: OpenCV
    * quantizes the interpolation weights to 11-bit fixed point, which can
    * flip the final byte by ±1 near exact coefficient boundaries; this
    * kernel keeps exact real weights, and MultimodalSpec pins the output
    * against hand-computed pixels.
    */
  def resizeBilinear(s: MediaSample, outW: Int, outH: Int): MediaSample = {
    require(!s.encoded, "decode before resize")
    require(outW > 0 && outH > 0)
    // half-pixel source coordinate clamped into the grid: returns the low
    // index i0 and the fractional weight toward i0+1, both in-range so the
    // interpolation stays convex (a boundary sample replicates the edge)
    def axis(dst: Int, out: Int, src: Int): (Int, Double) = {
      if (src == 1) (0, 0.0)
      else {
        val f0 = (dst + 0.5) * src.toDouble / out - 0.5
        val f = math.max(0.0, math.min(f0, src - 1.0))
        val i0 = math.min(math.floor(f).toInt, src - 2)
        (i0, f - i0)
      }
    }
    val c = s.channels
    val out = new Array[Byte](outW * outH * c)
    var y = 0
    while (y < outH) {
      val (y0, dy) = axis(y, outH, s.height)
      val y1 = if (y0 + 1 < s.height) y0 + 1 else y0
      var x = 0
      while (x < outW) {
        val (x0, dx) = axis(x, outW, s.width)
        val x1 = if (x0 + 1 < s.width) x0 + 1 else x0
        var ch = 0
        while (ch < c) {
          def px(yy: Int, xx: Int): Int =
            s.data((yy * s.width + xx) * c + ch) & 0xff
          val v = (1 - dy) * ((1 - dx) * px(y0, x0) + dx * px(y0, x1)) +
            dy * ((1 - dx) * px(y1, x0) + dx * px(y1, x1))
          out((y * outW + x) * c + ch) = math.round(v).toByte
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    s.copy(height = outH, width = outW, data = out)
  }

  /** BGR HWC buffer → single-channel grayscale, the same OpenCV weights
    * (0.299 R + 0.587 G + 0.114 B, rounded half-up) as [[decode]]'s
    * grayscale path — one formula, two entry points.
    */
  def toGray(s: MediaSample): MediaSample = {
    require(!s.encoded)
    if (s.channels == 1) s
    else {
      require(s.channels == 3, "toGray expects 1- or 3-channel HWC")
      val n = s.height * s.width
      val out = new Array[Byte](n)
      var p = 0
      while (p < n) {
        val b = s.data(p * 3) & 0xff
        val g = s.data(p * 3 + 1) & 0xff
        val r = s.data(p * 3 + 2) & 0xff
        out(p) = math.round(0.299f * r + 0.587f * g + 0.114f * b).toByte
        p += 1
      }
      s.copy(channels = 1, data = out)
    }
  }

  /** dHash-64 perceptual image hash (difference hash; the standard
    * near-dup fingerprint of image pipelines): grayscale → nearest-resize
    * to 9×8 → one bit per horizontal neighbour pair, set when the left
    * pixel is darker (g[r][c] < g[r][c+1]), packed MSB-first in row-major
    * (r,c) order. Built ON the real kernels — [[toGray]] and
    * [[resizeNearest]] — so the hash of a decoded JPEG and the hash the
    * oracle recomputes from raw pixel bytes go through the same code.
    * Robust to re-encoding/resize/brightness shifts (gradient signs
    * survive); 64 bits → Hamming-banded candidate generation downstream.
    */
  def dhash64(data: Array[Byte], channels: Int, height: Int, width: Int): Long = {
    require(data.length >= channels * height * width && height > 0 && width > 0)
    val g = toGray(MediaSample("", "", channels, height, width, encoded = false,
      if (data.length == channels * height * width) data
      else java.util.Arrays.copyOf(data, channels * height * width)))
    val r = resizeNearest(g, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val a = r.data(y * 9 + x) & 0xff
        val b = r.data(y * 9 + x + 1) & 0xff
        hash = (hash << 1) | (if (a < b) 1L else 0L)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** P8 (LmdbRDD.scala:270-281): channel-planar CHW bytes → interleaved HWC.
    * Real kernel — the reference runs this on every LMDB-decoded sample.
    */
  def chwToHwc(data: Array[Byte], channels: Int, height: Int, width: Int): Array[Byte] = {
    require(data.length == channels * height * width)
    val out = new Array[Byte](data.length)
    val hw = height * width
    var c = 0
    while (c < channels) {
      var p = 0
      while (p < hw) {
        out(p * channels + c) = data(c * hw + p)
        p += 1
      }
      c += 1
    }
    out
  }

  /** P10 crop (FloatDataTransformer crop param): top-left (x0,y0) crop of an
    * HWC buffer.
    */
  def crop(s: MediaSample, x0: Int, y0: Int, w: Int, h: Int): MediaSample = {
    require(!s.encoded && x0 + w <= s.width && y0 + h <= s.height)
    val out = new Array[Byte](w * h * s.channels)
    var y = 0
    while (y < h) {
      System.arraycopy(s.data, ((y0 + y) * s.width + x0) * s.channels,
        out, y * w * s.channels, w * s.channels)
      y += 1
    }
    s.copy(width = w, height = h, data = out)
  }

  /** P10 mirror (horizontal flip) of an HWC buffer. */
  def mirror(s: MediaSample): MediaSample = {
    require(!s.encoded)
    val out = new Array[Byte](s.data.length)
    var y = 0
    while (y < s.height) {
      var x = 0
      while (x < s.width) {
        var c = 0
        while (c < s.channels) {
          out((y * s.width + x) * s.channels + c) =
            s.data((y * s.width + (s.width - 1 - x)) * s.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    s.copy(data = out)
  }

  /** Sample every k-th frame of a frame-major payload (video stand-in). */
  def frameSample(payload: Array[Byte], frameBytes: Int, everyK: Int): Seq[Array[Byte]] = {
    require(frameBytes > 0 && everyK > 0)
    val nFrames = payload.length / frameBytes
    (0 until nFrames by everyK).map { f =>
      java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes)
    }
  }

  /** Audio-modality features over a 16-bit little-endian PCM payload:
    * per-window RMS energy and zero-crossing rate — the classic first-stage
    * features of an audio quality/VAD pipeline, computed directly on the
    * opaque binary column (no codec needed for raw PCM). Windows are
    * non-overlapping `windowSamples`-sized; a ragged tail is dropped.
    */
  final case class AudioWindow(idx: Int, rms: Double, zeroCrossRate: Double)

  /** EXACT per-window PCM statistics — the integer core both feature
    * surfaces share: sum of squared samples (exact int64: 16-bit samples,
    * any sane window size stays far under 2⁶³) and the zero-crossing
    * count. [[pcmFeatures]] derives its rms/zcr doubles from this; the
    * oracle-checked q72 emits these exact integers directly, so the
    * cross-engine compare never touches a transcendental.
    */
  final case class AudioWindowExact(idx: Int, sumSq: Long, crossings: Int,
    nSamples: Int)

  def pcmWindowStats(payload: Array[Byte], windowSamples: Int): Seq[AudioWindowExact] = {
    require(windowSamples > 0)
    val nSamples = payload.length / 2
    val nWin = nSamples / windowSamples
    (0 until nWin).map { w =>
      var sumSq = 0L
      var crossings = 0
      var prevNeg = false
      var i = 0
      while (i < windowSamples) {
        val off = (w * windowSamples + i) * 2
        val s = ((payload(off) & 0xff) | (payload(off + 1) << 8)).toShort.toInt
        sumSq += s.toLong * s
        val neg = s < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      AudioWindowExact(w, sumSq, crossings, windowSamples)
    }
  }

  def pcmFeatures(payload: Array[Byte], windowSamples: Int): Seq[AudioWindow] =
    pcmWindowStats(payload, windowSamples).map(w =>
      AudioWindow(w.idx, math.sqrt(w.sumSq.toDouble / w.nSamples),
        w.crossings.toDouble / (w.nSamples - 1).max(1)))

  /** Deterministic PCM test-signal synthesis: each codepoint becomes one
    * centered/scaled 16-bit LE sample `(cp − center)·gain` (clamped to the
    * int16 range). The sandbox's stand-in for real audio payloads — one
    * tight byte loop, so building the fake waveform costs what a memcpy
    * costs, not a hex round-trip.
    */
  def pcmFromCodepoints(text: String, center: Int, gain: Int): Array[Byte] = {
    val n = text.codePointCount(0, text.length)
    val out = new Array[Byte](n * 2)
    var i = 0
    var j = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val v0 = (cp - center) * gain
      val v = if (v0 > 32767) 32767 else if (v0 < -32768) -32768 else v0
      out(j) = (v & 0xff).toByte
      out(j + 1) = ((v >> 8) & 0xff).toByte
      i += Character.charCount(cp)
      j += 2
    }
    out
  }

  /** Distributed audio feature stage: binary PCM column → exploded
    * (id, label, window idx, rms, zcr) rows, one batch-pure partition pass
    * (the same per-partition shape as [[decodeAndResize]]).
    */
  def pcmFeatureFrame(ds: Dataset[MediaSample], windowSamples: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap(s => pcmFeatures(s.data, windowSamples)
        .map(w => (s.id, s.label, w.idx, w.rms, w.zeroCrossRate)))
      .toDF("id", "label", "win", "rms", "zcr")
  }

  /** Dataset pipeline: decode + resize as one per-partition batch stage
    * (iterator-chained like the reference's transformer thread, minus the
    * cross-task singleton M6 anti-pattern — each partition is pure).
    * Undecodable samples drop out (reference ImageDataSource.scala:144-151:
    * decode-failed Mats are skipped, the batch keeps filling). Resize
    * defaults to [[resizeBilinear]] — the reference's Mat.resize default is
    * OpenCV INTER_LINEAR — with `bilinear = false` opting into the cheaper
    * nearest-neighbour kernel.
    */
  def decodeAndResize(ds: Dataset[MediaSample], outW: Int, outH: Int,
      numChannels: Int = 0, bilinear: Boolean = true): Dataset[MediaSample] = {
    import ds.sparkSession.implicits._
    val resize: MediaSample => MediaSample =
      if (bilinear) resizeBilinear(_, outW, outH) else resizeNearest(_, outW, outH)
    ds.mapPartitions(_.flatMap(s => decode(s, numChannels).map(resize)))
  }

  /** P10 normalization — the transformer's scale-multiply + mean-subtract
    * (reference FloatDataTransformer.java:15-40 wrapping Caffe's
    * `(value − mean) · scale`; transform_param scale / mean_value /
    * mean_file, e.g. data/lrcn_cos.prototxt:33-39): u8 HWC bytes → float
    * buffer. `mean.length == channels` is the per-channel mean_value mode
    * (channel = i mod channels on interleaved HWC); `mean.length ==
    * data.length` is the per-pixel mean_file (corpus-mean blob) mode.
    * Same arithmetic as the codegen'd column form
    * ([[org.apache.spark.sql.graft.VecNormalize]]).
    */
  def normalize(s: MediaSample, mean: Array[Float], scale: Float): Array[Float] = {
    require(!s.encoded, "normalize needs a decoded buffer")
    require(mean.length == s.channels || mean.length == s.data.length,
      s"mean length ${mean.length} matches neither channels ${s.channels} " +
        s"nor buffer ${s.data.length}")
    val out = new Array[Float](s.data.length)
    var i = 0
    while (i < out.length) {
      out(i) = ((s.data(i) & 0xFF) - mean(i % mean.length)) * scale
      i += 1
    }
    out
  }

  /** Corpus per-pixel mean — the `compute_image_mean` / mean_file producer:
    * element-wise mean over same-shape decoded buffers via the A1
    * VectorMean aggregate (map-side partial sums; one (dim)-sized buffer
    * per partition reaches the exchange). Feed [[normalize]]'s per-pixel
    * mode or slice per channel.
    */
  def pixelMean(ds: Dataset[MediaSample], dim: Int): Array[Float] = {
    import ds.sparkSession.implicits._
    val vm = org.apache.spark.sql.functions.udaf(new graft.agg.VectorMean(dim))
    ds.map(s => s.data.map(b => (b & 0xFF).toFloat).toSeq).toDF("px")
      .agg(vm(col("px"))).head().getSeq[Double](0).map(_.toFloat).toArray
  }

  /** Normalized feature-vector stage: decode → normalize, the transformer
    * chain a features/train pipeline runs per sample (P10 complete).
    */
  def normalizeFrame(ds: Dataset[MediaSample], mean: Array[Float],
      scale: Float): DataFrame = {
    import ds.sparkSession.implicits._
    ds.map(s => (s.id, s.label, normalize(s, mean, scale).toSeq))
      .toDF("id", "label", "features")
  }

  /** Build a MediaSample dataset from the documents table, payload = utf8
    * bytes (the environment's stand-in for real media blobs).
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaSample] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("id"), col("lang").as("label"),
        lit(0).as("channels"), lit(0).as("height"), lit(0).as("width"),
        lit(true).as("encoded"), col("text").cast("binary").as("data"))
      .as[MediaSample]
  }
}
