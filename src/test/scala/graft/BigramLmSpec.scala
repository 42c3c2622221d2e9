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

  test("broadcast-form scoring == literal-form scoring bit-for-bit at V=24 (the literal-ceiling alternate path)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.TextExpressions.{bigram_nll, class_seq}
    // larger than the shipped V=16, below the corpus's ~31 distinct words
    // (the model's C = V+1 keying assumes a full top-V vocabulary)
    val V = 24
    val docs = Tables(spark, sf, "documents")
    val f = queries.TextOps.tokenizedNonEmpty(docs).filter(col("dl") >= 2)
    val (vw, cu, _, cb) = queries.TextOps.bigramModelFrom(f, V)
    assert(vw.length == V && cu.length == V + 1 && cb.length == (V + 1) * (V + 1))
    val viaLiteral = f.select(col("doc_id"),
        bigram_nll(class_seq(col("t"), typedLit(vw)), typedLit(cb), typedLit(cu))
          .as("nll"))
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val viaBroadcast = queries.TextOps.bigramScoredBroadcast(docs, V)
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    assert(viaLiteral.nonEmpty && viaLiteral == viaBroadcast,
      "the broadcast form must be a pure plan decision — same doubles bit-for-bit")
    Caches.clearAll(spark)
  }
}
