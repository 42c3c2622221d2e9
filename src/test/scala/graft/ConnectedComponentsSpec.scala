package graft

import graft.operators.Components

/** connectedComponents: min-label fixpoint over pair graphs — the cluster
  * layer of the dedup pipeline (q62 wires it over the q21 pair set; this
  * spec pins the operator on constructed graphs where the answer is
  * obvious, including the long-chain shape whose diameter the pointer
  * jump exists for — plain propagation at the old maxIter=20 silently
  * returned a WRONG clustering on chains longer than 20).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, cliques, and disjoint components get their minimum id") {
    val got = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),         // chain
      (10L, 11L),                           // pair
      (20L, 21L), (21L, 22L), (20L, 22L)))  // triangle
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a 120-node chain converges within the pointer-jump round budget") {
    // plain propagation would need ~120 rounds and trip maxRounds; path
    // halving needs ~log2(120) — the default budget of 50 must be ample
    val chain = (100L until 219L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size == 120)
    assert(got.values.forall(_ == 100L))
  }

  test("reversed and duplicated edges change nothing") {
    val got = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (3L, 9L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }
}
