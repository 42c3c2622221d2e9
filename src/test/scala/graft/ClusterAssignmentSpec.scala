package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The persisted cluster-label layout (sources/ClusterAssignment): the
  * near-dup components computed once per corpus and consumed by q62
  * (full graph), q63/q101 and the SplitAssignment build (strong slice) —
  * pinned equal to the inline Components computation it replaces, and
  * covered for stamp/invalidation semantics like PairGraph's.
  */
class ClusterAssignmentSpec extends SparkSpec {

  test("layout rows are EXACTLY the inline components computation's") {
    val layout = sources.ClusterAssignment(spark, sf)
      .orderBy("doc_id").collect()
    val inline = sources.ClusterAssignment.inlineFrame(spark, sf)
      .orderBy("doc_id").collect()
    assert(layout.length == inline.length && layout.length > 0)
    layout.zip(inline).foreach { case (a, b) => assert(a == b) }
  }

  test("label invariants: full covers strong, labels are component minima") {
    val ca = sources.ClusterAssignment(spark, sf)
    // every strong-labeled doc also has a full label (strong edges are a
    // subset of the pair graph, so its node set is too)
    assert(ca.filter(col("cluster_full").isNull).count() == 0)
    // a min-label fixpoint: no label exceeds its doc_id's own cluster
    // member minimum — the canonical id is a member of its own cluster
    for (c <- Seq("cluster_full", "cluster_strong")) {
      val labels = ca.filter(col(c).isNotNull)
      assert(labels.filter(col(c) > col("doc_id")).count() == 0,
        s"$c has a label above a member id — not the min-label fixpoint")
      // the canonical doc of every cluster appears as a row of the layout
      val orphans = labels.select(col(c).as("doc_id")).distinct()
        .join(labels.select("doc_id"), Seq("doc_id"), "left_anti").count()
      assert(orphans == 0, s"$c has a canonical id that is not a member")
    }
  }

  test("strong labels match a direct CC run over the strong pair slice") {
    val direct = graft.operators.Components.connectedComponents(
        sources.PairGraph(spark, sf)
          .filter(col("jaccard") >= sources.ClusterAssignment.StrongJaccard)
          .select("a", "b"))
      .orderBy("id").collect()
    val viaLayout = sources.ClusterAssignment.strongComponents(spark, sf)
      .orderBy("id").collect()
    assert(direct.length == viaLayout.length && direct.length > 0)
    direct.zip(viaLayout).foreach { case (a, b) => assert(a == b) }
  }

  test("layout path is stamped on documents.parquet and builds a _SUCCESS-marked dir") {
    val path = sources.ClusterAssignment.layoutPath(sf)
    sources.ClusterAssignment(spark, sf) // ensure built
    assert(Files.exists(Paths.get(path, "_SUCCESS")))
    val other = sources.ClusterAssignment.layoutPath("/root/testdata/sf0.01")
    assert(other != path)
  }
}
