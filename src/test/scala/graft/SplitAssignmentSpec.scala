package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The persisted split-assignment layout (sources/SplitAssignment): the
  * q68 leakage-safe split assigned once per corpus and consumed by
  * q68/q70/q81 — pinned equal to the inline computation it replaces, and
  * covered for stamp/invalidation semantics like PairGraph's.
  */
class SplitAssignmentSpec extends SparkSpec {

  test("layout rows are EXACTLY the inline q68 computation's") {
    val layout = sources.SplitAssignment(spark, sf)
      .orderBy("doc_id").collect()
    val inline = queries.DedupOps.leakageSafeSplitFrame(spark, sf)
      .orderBy("doc_id").collect()
    assert(layout.length == inline.length && layout.length > 0)
    layout.zip(inline).foreach { case (a, b) => assert(a == b) }
  }

  test("layout covers every document exactly once, splits well-formed") {
    val docs = Tables(spark, sf, "documents").count()
    val sp = sources.SplitAssignment(spark, sf)
    assert(sp.count() == docs)
    assert(sp.select("doc_id").distinct().count() == docs)
    val splits = sp.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // every cluster lands in exactly one split — the leakage-safety invariant
    val multi = sp.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(multi == 0L)
  }

  test("layout path is stamped on documents.parquet and builds a _SUCCESS-marked dir") {
    val path = sources.SplitAssignment.layoutPath(sf)
    sources.SplitAssignment(spark, sf) // ensure built
    assert(Files.exists(Paths.get(path, "_SUCCESS")))
    // a different source dir yields a different layout path (source key),
    // and the stamp key derives from documents.parquet alone
    val other = sources.SplitAssignment.layoutPath("/root/testdata/sf0.01")
    assert(other != path)
  }
}
