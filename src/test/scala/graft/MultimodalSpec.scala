package graft

import graft.multimodal.{MediaSample, Multimodal}

class MultimodalSpec extends SparkSpec {

  test("stubDecode: deterministic dims from payload length, HWC buffer") {
    val s = MediaSample("1", "en", 0, 0, 0, encoded = true, Array.fill(130)(7.toByte))
    val d = Multimodal.stubDecode(s)
    assert(!d.encoded)
    assert(d.width == 1 + 130 % 64 && d.height == 1 + (130 / 64) % 64 && d.channels == 3)
    assert(d.data.length == d.width * d.height * 3)
    // determinism
    assert(Multimodal.stubDecode(s).data.toSeq == d.data.toSeq)
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

  test("frameSample: every k-th frame, exact frame boundaries") {
    val payload = Array.tabulate(30)(_.toByte)
    val frames = Multimodal.frameSample(payload, frameBytes = 10, everyK = 2)
    assert(frames.length == 2)
    assert(frames(0).toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }

  test("decodeAndResize pipeline runs distributed over documents") {
    val ds = Multimodal.fromDocuments(spark, sf)
    val out = Multimodal.decodeAndResize(ds, 8, 8).collect()
    assert(out.length == Tables(spark, sf, "documents").count())
    assert(out.forall(s => s.width == 8 && s.height == 8 && s.data.length == 8 * 8 * 3))
  }
}
