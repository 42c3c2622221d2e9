package graft

import org.scalatest.funsuite.AnyFunSuite

/** The derived-layout staleness contract (r17 ADVICE): a layout's
  * identity must be a pure function of EVERY semantic constituent in its
  * derivation chain, so changing any of them mints a fresh path — no
  * hand-maintained Version constant a human must remember to bump in
  * lockstep with an upstream change.
  */
class LayoutStampSpec extends AnyFunSuite {

  test("ClusterAssignment's tag folds in the strong threshold and the full upstream chain") {
    val tag = graft.sources.ClusterAssignment.versionTag()
    assert(tag.contains(graft.sources.PairGraph.versionTag()),
      "the cluster stamp must embed PairGraph's full tag — an upstream " +
        "semantic change must re-stamp the labels")
    assert(tag.contains(graft.sources.ClusterAssignment.StrongJaccard.toString))
  }

  test("PairGraph's tag folds in the jaccard floor and ShinglePostings' tag") {
    val tag = graft.sources.PairGraph.versionTag()
    assert(tag.contains(graft.sources.ShinglePostings.versionTag),
      "the pair stamp must embed the postings tag — a shingle-grammar or " +
        "DfCap change must re-stamp the pair relation")
    assert(tag.contains(graft.queries.TextOps.PairJaccardFloor.toString))
  }

  test("ShinglePostings' tag folds in the DF cap and the fingerprint grammar") {
    assert(graft.sources.ShinglePostings.versionTag
      .contains(graft.queries.TextOps.DfCap.toString))
    assert(graft.sources.ShinglePostings.versionTag
      .contains(graft.sources.DocFingerprints.versionTag),
      "the postings cold build inverts DocFingerprints — a grammar change " +
        "there must re-stamp the postings (and transitively the whole chain)")
  }

  test("a constituent change anywhere in the chain changes the layout path") {
    val dir = "/root/testdata/sf0.001"
    def pathWith(tag: String): String =
      graft.sources.DerivedLayout.layoutPath("clusters", tag, dir,
        Seq(s"$dir/documents.parquet"))
    val base = pathWith(graft.sources.ClusterAssignment.versionTag())
    // the production path IS the composed-tag path (not a parallel scheme)
    assert(graft.sources.ClusterAssignment.layoutPath(dir) == base)
    // threshold change at this layer
    assert(pathWith(graft.sources.ClusterAssignment.versionTag(strong = 0.61)) != base)
    // pair-floor change one layer up
    assert(pathWith(graft.sources.ClusterAssignment.versionTag(
      upstream = graft.sources.PairGraph.versionTag(floor = 0.07))) != base)
    // postings-semantics change two layers up
    assert(pathWith(graft.sources.ClusterAssignment.versionTag(
      upstream = graft.sources.PairGraph.versionTag(upstream = "v3.cap40"))) != base)
  }
}
