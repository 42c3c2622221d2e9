package graft

/** The stamped curriculum artifact serves EXACTLY the model inline
  * training produces — vocab order, counts, total, and the three
  * interpolated thresholds (doubles round-trip parquet bit-for-bit) —
  * so layout-served q110 phases are bit-identical to the pre-layout
  * per-query derivation by construction.
  */
class CurriculumThresholdsSpec extends SparkSpec {

  test("layout model == inline model, field for field (thresholds bit-exact)") {
    val viaLayout = sources.CurriculumThresholds.model(spark, sf)
    val inline = queries.TextOps.curriculumModel(Tables(spark, sf, "documents"))
    assert(viaLayout.vw == inline.vw, "vocab diverged")
    assert(viaLayout.vc == inline.vc, "counts diverged")
    assert(viaLayout.total == inline.total, "corpus total diverged")
    Seq(("p25", viaLayout.p25, inline.p25), ("p50", viaLayout.p50, inline.p50),
        ("p75", viaLayout.p75, inline.p75)).foreach { case (n, a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b), s"$n threshold diverged: $a vs $b")
    }
    // shape sanity: quartile thresholds are ordered; vocab is V entries
    assert(viaLayout.p25 <= viaLayout.p50 && viaLayout.p50 <= viaLayout.p75)
    assert(viaLayout.vw.length == queries.TextOps.PplVocab &&
      viaLayout.vc.length == viaLayout.vw.length)
  }

  test("the stamp folds vocab size + quantization and lands an atomic _SUCCESS dir") {
    assert(sources.CurriculumThresholds.versionTag
      .contains(queries.TextOps.PplVocab.toString))
    assert(sources.CurriculumThresholds.versionTag.contains("n3"))
    sources.CurriculumThresholds.model(spark, sf)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      sources.CurriculumThresholds.layoutPath(sf), "_SUCCESS")))
  }
}
