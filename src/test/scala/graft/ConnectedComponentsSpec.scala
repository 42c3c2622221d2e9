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

  test("convergence count rides the round's materialization — no extra action") {
    // count Spark jobs launched by connectedComponents via a job group;
    // the statusTracker fills asynchronously, so poll until stable
    val sc = spark.sparkContext
    sc.setJobGroup("cc-jobs", "cc job accounting", interruptOnCancel = false)
    import spark.implicits._
    val chain = (0L until 64L).map(i => (i, i + 1))
    try Components.connectedComponents(chain.toDF("a", "b"))
    finally sc.clearJobGroup()
    def jobs: Int = sc.statusTracker.getJobIdsForGroup("cc-jobs").length
    var last = -1; var now = jobs
    while (now != last) { Thread.sleep(200); last = now; now = jobs }
    // a 65-node chain converges in 5 pointer-jump rounds + 1 stable round.
    // Each round is ONE action (the convergence count materializes the
    // LAZY localCheckpoint); AQE runs each shuffle stage of that action as
    // its own job, so the measured total is 64. The pre-round-9 shape
    // (eager checkpoint + a separate count action per round) measured 72
    // on this same graph — the bound sits between the two to fail on any
    // reintroduced per-round action while tolerating AQE stage jitter.
    assert(now > 0 && now <= 68, s"connectedComponents launched $now jobs")
  }
}
