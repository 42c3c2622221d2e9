package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.{MediaSample, Multimodal}

class MultimodalSpec extends SparkSpec {

  /** Encode a 2x2 image with known RGB pixels to the given format. */
  private def fixture(format: String): Array[Byte] = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red
    img.setRGB(1, 0, 0x00ff00) // green
    img.setRGB(0, 1, 0x0000ff) // blue
    img.setRGB(1, 1, 0xffffff) // white
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("decode: real PNG → HWC BGR buffer with exact pixel values") {
    val s = MediaSample("1", "en", 0, 0, 0, encoded = true, fixture("png"))
    val d = Multimodal.decode(s, numChannels = 3).get
    assert(!d.encoded && d.width == 2 && d.height == 2 && d.channels == 3)
    // BGR interleaved (OpenCV Mat convention): red pixel = (0, 0, 255)
    assert(d.data.slice(0, 3).map(_ & 0xff).toSeq == Seq(0, 0, 255))
    assert(d.data.slice(3, 6).map(_ & 0xff).toSeq == Seq(0, 255, 0))
    assert(d.data.slice(6, 9).map(_ & 0xff).toSeq == Seq(255, 0, 0))
    assert(d.data.slice(9, 12).map(_ & 0xff).toSeq == Seq(255, 255, 255))
  }

  test("decode: real JPEG decodes with correct dims; grayscale mode gives 1 channel") {
    val s = MediaSample("1", "en", 0, 0, 0, encoded = true, fixture("jpg"))
    val d = Multimodal.decode(s).get
    assert(d.width == 2 && d.height == 2 && d.channels == 3)
    val g = Multimodal.decode(s.copy(), numChannels = 1).get
    assert(g.channels == 1 && g.data.length == 4)
    // white pixel → near-255 gray (JPEG is lossy; 2x2 chroma bleed ≈ ±10)
    assert((g.data(3) & 0xff) >= 240)
  }

  test("decode: undecodable payload is skipped (None), not an error") {
    val junk = MediaSample("1", "en", 0, 0, 0, encoded = true,
      "definitely not an image".getBytes)
    assert(Multimodal.decode(junk).isEmpty)
    val empty = MediaSample("2", "en", 0, 0, 0, encoded = true, Array.emptyByteArray)
    assert(Multimodal.decode(empty).isEmpty)
  }

  test("resizeNearest: exact dims, corner pixels preserved") {
    val w = 4; val h = 2; val c = 1
    val px = Array.tabulate(w * h * c)(i => i.toByte)
    val s = MediaSample("1", "x", c, h, w, encoded = false, px)
    val r = Multimodal.resizeNearest(s, 2, 1)
    assert(r.width == 2 && r.height == 1)
    assert(r.data.length == 2)
    assert(r.data(0) == px(0)) // top-left preserved by NN
  }

  test("resizeBilinear: hand-computed pixels, downscale and upscale") {
    // 2x2 gray source: [[0, 100], [200, 50]]
    val s = MediaSample("1", "x", 1, 2, 2, encoded = false,
      Array[Byte](0, 100, 200.toByte, 50))
    // 2x2 -> 3x3, half-pixel mapping f=(d+0.5)*2/3-0.5 gives source
    // fractions (0, 0.5, 1) per axis after edge clamping:
    //   row0: 0, .5*0+.5*100=50, 100
    //   row1: 100, .25*(0+100+200+50)=87.5->88, .5*100+.5*50=75
    //   row2: 200, 125, 50
    val up3 = Multimodal.resizeBilinear(s, 3, 3)
    assert(up3.width == 3 && up3.height == 3)
    assert(up3.data.map(_ & 0xff).toSeq ==
      Seq(0, 50, 100, 100, 88, 75, 200, 125, 50))
    // 2x2 -> 4x4, fractions (0, 0.25, 0.75, 1) per axis:
    val up4 = Multimodal.resizeBilinear(s, 4, 4)
    assert(up4.data.map(_ & 0xff).toSeq == Seq(
      0, 25, 75, 100,          // dy=0
      50, 59, 78, 88,          // dy=.25: 59.375, 78.125, 87.5 (half-up)
      150, 128, 84, 63,        // dy=.75: 128.125, 84.375, 62.5 (half-up)
      200, 163, 88, 50))       // dy=1:  162.5, 87.5
    // identity resize is exact
    assert(Multimodal.resizeBilinear(s, 2, 2).data.toSeq == s.data.toSeq)
    // channels interpolate independently (unsigned bytes > 127 included)
    val c2 = MediaSample("2", "x", 2, 1, 2, encoded = false,
      Array[Byte](10, 250.toByte, 30, 130.toByte))
    val r2 = Multimodal.resizeBilinear(c2, 2, 1)
    assert(r2.data.map(_ & 0xff).toSeq == Seq(10, 250, 30, 130))
    val mid = Multimodal.resizeBilinear(c2, 1, 1) // both pixels at weight .5
    assert(mid.data.map(_ & 0xff).toSeq == Seq(20, 190))
  }

  test("frameSample: every k-th frame, exact frame boundaries") {
    val payload = Array.tabulate(30)(_.toByte)
    val frames = Multimodal.frameSample(payload, frameBytes = 10, everyK = 2)
    assert(frames.length == 2)
    assert(frames(0).toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }

  test("decodeAndResize pipeline runs distributed over real encoded images") {
    import spark.implicits._
    val png = fixture("png")
    val jpg = fixture("jpg")
    val samples = (0 until 20).map { i =>
      MediaSample(i.toString, "en", 0, 0, 0, encoded = true,
        if (i % 2 == 0) png else jpg)
    } :+ MediaSample("junk", "en", 0, 0, 0, encoded = true, Array[Byte](1, 2, 3))
    val ds = spark.createDataset(samples).repartition(4)
    val out = Multimodal.decodeAndResize(ds, 8, 8, numChannels = 3).collect()
    // the undecodable sample drops out; all decodable ones resize to 8x8x3
    assert(out.length == 20)
    assert(out.forall(s => s.width == 8 && s.height == 8 && s.data.length == 8 * 8 * 3))
  }

  test("decodeAndResize skips text payloads from documents (not images)") {
    val ds = Multimodal.fromDocuments(spark, sf)
    assert(Multimodal.decodeAndResize(ds, 8, 8).count() == 0)
  }

  test("dhash64: hand-computed hashes on 9x8 buffers (no resize)") {
    // ascending row: every left pixel darker → all 64 bits set
    val asc = Array.tabulate(72)(i => (i % 9).toByte)
    assert(Multimodal.dhash64(asc, 1, 8, 9) == -1L)
    // descending row: no bit set
    val desc = Array.tabulate(72)(i => (8 - i % 9).toByte)
    assert(Multimodal.dhash64(desc, 1, 8, 9) == 0L)
    // single gradient at (row 0, col 0): only the MSB set
    val one = new Array[Byte](72)
    one(1) = 1
    assert(Multimodal.dhash64(one, 1, 8, 9) == Long.MinValue)
    // unsigned compare: 0x80 (128) must be greater than 0x7f (127)
    val u = new Array[Byte](72)
    u(0) = 127; u(1) = -128 // 127 < 128 unsigned → MSB set
    assert((Multimodal.dhash64(u, 1, 8, 9) >>> 63) == 1L)
  }

  test("dhash64: nearest-resize path — 18x16 ascending survives downscale") {
    // pixel = x: resize samples (2y, 2x) → still ascending → all bits set
    val img = Array.tabulate(16 * 18)(i => (i % 18).toByte)
    assert(Multimodal.dhash64(img, 1, 16, 18) == -1L)
  }

  test("dhash64: real PNG decode → gray → hash, hand-computed") {
    // 2x2 red/green/blue/white → gray (76,150 / 29,255); 9x8 resize maps
    // cols 0-4→left, 5-8→right, rows 0-3→top, 4-7→bottom. Each row has one
    // rising edge at c=4 → every row byte is 0x08.
    val d = Multimodal.decode(
      MediaSample("1", "en", 0, 0, 0, encoded = true, fixture("png")),
      numChannels = 1).get
    assert(Multimodal.dhash64(d.data, 1, d.height, d.width) == 0x0808080808080808L)
    // 3-channel path: decode BGR, toGray inside dhash64 — same hash
    val c = Multimodal.decode(
      MediaSample("1", "en", 0, 0, 0, encoded = true, fixture("png")),
      numChannels = 3).get
    assert(Multimodal.dhash64(c.data, 3, c.height, c.width) == 0x0808080808080808L)
  }

  test("dhash64 native expression matches the kernel and stays codegen'd") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Array.tabulate(72)(i => (i % 9).toByte), 8, 9),
      (2L, Array.tabulate(16 * 18)(i => (i % 18).toByte), 16, 18))
    val df = rows.toDF("id", "data", "h", "w")
    val out = df.select(col("id"), org.apache.spark.sql.graft.ImageExpressions
        .dhash64(col("data"), lit(1), col("h"), col("w")).as("hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == -1L && out(2L) == -1L)
    // SQL registry surface
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("imgs")
    val sq = spark.sql("SELECT dhash64(data, 1, h, w) AS hash FROM imgs WHERE id = 1")
      .collect().head.getLong(0)
    assert(sq == -1L)
  }

  test("dhashNearDupPairs: cross-cluster banding finds hamming<=3, misses beyond") {
    import spark.implicits._
    // hashes as (hi, lo) halves: A and B differ in 2 bits of lo (hamming 2,
    // three clean bands); C differs from A in 5 spread bits (hamming 5 →
    // dropped by verify even though one band may collide); D == A (exact
    // dup → intra-cluster pair at hamming 0)
    val a = (0xDEADBEEFL, 0x12345678L)
    val b = (0xDEADBEEFL, 0x12345678L ^ 0x3L)           // 2 low bits flipped
    val cHi = 0xDEADBEEFL ^ ((1L << 20) | (1L << 4))    // 2 bits in hi
    val cLo = 0x12345678L ^ ((1L << 30) | (1L << 17) | 1L) // 3 bits in lo
    val sig = Seq(
      (10L, a._1, a._2), (11L, b._1, b._2),
      (12L, cHi, cLo), (13L, a._1, a._2))
      .toDF("doc_id", "hi", "lo")
    val out = graft.queries.MultimodalOps.dhashNearDupPairs(sig)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((10L, 11L, 2), (10L, 13L, 0), (11L, 13L, 2)))
  }

  test("pcmWindowStats: exact integers, and pcmFeatures derives from them") {
    def le16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    // window 1: [3, -4, 5, 0] → sumsq 9+16+25+0 = 50, crossings + - + +: 2
    // window 2: [-1, -1, 2, 2] → sumsq 10, crossings 1; ragged [7] drops
    val stats = Multimodal.pcmWindowStats(
      le16(Seq(3, -4, 5, 0, -1, -1, 2, 2, 7)), 4)
    assert(stats == Seq(
      Multimodal.AudioWindowExact(0, 50L, 2, 4),
      Multimodal.AudioWindowExact(1, 10L, 1, 4)))
    val f = Multimodal.pcmFeatures(le16(Seq(3, -4, 5, 0)), 4)
    assert(math.abs(f.head.rms - math.sqrt(50.0 / 4)) < 1e-12)
    assert(math.abs(f.head.zeroCrossRate - 2.0 / 3) < 1e-12)
  }

  test("pcm_window_stats expression matches the kernel through SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def le16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val df = Seq((1L, le16(Seq(3, -4, 5, 0, -1, -1, 2, 2)))).toDF("id", "data")
    val rows = df.select(col("id"), explode(
        org.apache.spark.sql.graft.ImageExpressions
          .pcm_window_stats(col("data"), lit(4))).as("w"))
      .select("w.win", "w.sumsq", "w.zc", "w.n")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(rows.toSeq == Seq((0, 50L, 2, 4), (1, 10L, 1, 4)))
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("pcm")
    val sq = spark.sql(
      "SELECT size(pcm_window_stats(data, 4)) FROM pcm").collect().head.getInt(0)
    assert(sq == 2)
  }

  test("pcmFeatures: exact RMS and zero-crossing rate on synthetic PCM") {
    // square wave ±1000 alternating every sample: rms = 1000, zcr = 1
    def le16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val square = le16(Seq.tabulate(16)(i => if (i % 2 == 0) 1000 else -1000))
    val w = Multimodal.pcmFeatures(square, 8)
    assert(w.length == 2)
    assert(math.abs(w.head.rms - 1000.0) < 1e-9)
    assert(math.abs(w.head.zeroCrossRate - 1.0) < 1e-9)
    // constant positive signal: zcr = 0, rms = value
    val flat = le16(Seq.fill(8)(500))
    val f = Multimodal.pcmFeatures(flat, 8)
    assert(f.length == 1 && math.abs(f.head.rms - 500.0) < 1e-9 && f.head.zeroCrossRate == 0.0)
    // ragged tail dropped
    assert(Multimodal.pcmFeatures(le16(Seq.fill(11)(1)), 8).length == 1)
  }

  test("pcmFeatureFrame: distributed window rows with exact schema") {
    import spark.implicits._
    def le16(samples: Seq[Int]): Array[Byte] =
      samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val samples = (0 until 6).map(i =>
      MediaSample(i.toString, "en", 1, 0, 0, encoded = false,
        le16(Seq.tabulate(32)(j => (j + i) * 100))))
    val df = Multimodal.pcmFeatureFrame(spark.createDataset(samples).repartition(3), 16)
    assert(df.columns.toSeq == Seq("id", "label", "win", "rms", "zcr"))
    assert(df.count() == 12) // 2 windows per sample
    assert(df.filter(org.apache.spark.sql.functions.col("rms") <= 0).count() == 0)
  }

  test("normalize: hand-computed (x - mean) * scale, per-channel and per-pixel modes") {
    // 2x1 BGR image: pixels (10,20,30) and (110,220,130) interleaved HWC
    val s = MediaSample("i", "l", 3, 1, 2, encoded = false,
      Array[Byte](10, 20, 30, 110.toByte, 220.toByte, 130.toByte))
    // per-channel mean_value mode (lrcn_cos.prototxt's 104/117/123 shape)
    val perChan = Multimodal.normalize(s, Array(104f, 117f, 123f), 0.5f)
    assert(perChan.toSeq == Seq(
      (10 - 104) * 0.5f, (20 - 117) * 0.5f, (30 - 123) * 0.5f,
      (110 - 104) * 0.5f, (220 - 117) * 0.5f, (130 - 123) * 0.5f))
    // per-pixel mean_file mode: mean length == buffer length
    val perPix = Multimodal.normalize(s,
      Array(1f, 2f, 3f, 4f, 5f, 6f), 2f)
    assert(perPix.toSeq == Seq(18f, 36f, 54f, 212f, 430f, 248f))
    // byte values are unsigned: 220.toByte must read as 220, not -36
    assert(perChan(4) == (220 - 117) * 0.5f)
    intercept[IllegalArgumentException] {
      Multimodal.normalize(s, Array(1f, 2f), 1f) // neither channels nor dim
    }
  }

  test("pixelMean + normalize round-trip: corpus mean_file semantics (VectorMean reuse)") {
    import spark.implicits._
    val samples = Seq(
      MediaSample("a", "l", 1, 1, 4, encoded = false, Array[Byte](0, 10, 20, 30)),
      MediaSample("b", "l", 1, 1, 4, encoded = false, Array[Byte](100, 90, 80, 70)))
    val mean = Multimodal.pixelMean(spark.createDataset(samples), dim = 4)
    assert(mean.toSeq == Seq(50f, 50f, 50f, 50f))
    // normalizing by the corpus mean centres the corpus: the two samples
    // become exact negations of each other
    val na = Multimodal.normalize(samples(0), mean, 1f)
    val nb = Multimodal.normalize(samples(1), mean, 1f)
    assert(na.zip(nb).forall { case (x, y) => x == -y })
    // the frame stage carries the same floats
    val frame = Multimodal.normalizeFrame(spark.createDataset(samples), mean, 1f)
      .orderBy("id").collect()
    assert(frame.head.getSeq[Float](2) == na.toSeq)
  }

  test("vec_normalize expression matches the kernel and handles SQL literal modes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Seq(10f, 20f, 30f, 110f, 220f, 130f))).toDF("id", "v")
    val got = df.select(org.apache.spark.sql.graft.VectorExpressions
        .vec_normalize(col("v"), Seq(104f, 117f, 123f), 0.5f).as("n"))
      .head().getSeq[Float](0)
    assert(got == Seq(-47f, -48.5f, -46.5f, 3f, 51.5f, 3.5f))
    // SQL-registered form: int-literal array + fractional scale
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("vn")
    val sqlGot = spark.sql(
      "SELECT vec_normalize(v, array(104, 117, 123), 0.5) FROM vn")
      .head().getSeq[Float](0)
    assert(sqlGot == got)
  }
}
