package graft

/** The stamped bigram-LM artifact serves EXACTLY the model inline
  * training produces — vocab order, class counts, the dense table —
  * so layout-served q118 scores are bit-identical to the pre-layout
  * form by construction (ints/strings round-trip parquet exactly).
  */
class BigramLmSpec extends SparkSpec {

  test("layout model == inline model, field for field") {
    val viaLayout = sources.BigramLm.model(spark, sf)
    val inline = queries.TextOps.bigramModel(Tables(spark, sf, "documents"))
    assert(viaLayout._1 == inline._1, "vocab diverged")
    assert(viaLayout._2 == inline._2, "class counts diverged")
    assert(viaLayout._3 == inline._3, "corpus total diverged")
    assert(viaLayout._4 == inline._4, "bigram table diverged")
    // shape sanity: dense table is (V+1)², cu is V+1, total is Σcu
    val C = queries.TextOps.PplVocab + 1
    assert(viaLayout._4.length == C * C && viaLayout._2.length == C)
    assert(viaLayout._3 == viaLayout._2.sum)
  }

  test("the stamp folds the vocab size and lands an atomic _SUCCESS dir") {
    assert(sources.BigramLm.versionTag
      .contains(queries.TextOps.PplVocab.toString))
    sources.BigramLm.model(spark, sf)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      sources.BigramLm.layoutPath(sf), "_SUCCESS")))
  }
}
