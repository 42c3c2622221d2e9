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
    // The invariant is RELATIVE, not an absolute job total (a hardcoded
    // AQE job count couples the test to Spark's current stage-to-job
    // decomposition): the lazy checkpoint must launch strictly fewer jobs
    // than the eager form on the same graph under the same AQE, because
    // eager adds a materialization action per round that lazy folds into
    // the convergence count.
    val sc = spark.sparkContext
    import spark.implicits._
    val chain = (0L until 64L).map(i => (i, i + 1))
    def jobsFor(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, "cc job accounting", interruptOnCancel = false)
      try body finally sc.clearJobGroup()
      // the statusTracker fills asynchronously — poll until stable
      def jobs: Int = sc.statusTracker.getJobIdsForGroup(group).length
      var last = -1; var now = jobs
      while (now != last) { Thread.sleep(200); last = now; now = jobs }
      now
    }
    val lazyJobs = jobsFor("cc-lazy") {
      Components.connectedComponents(chain.toDF("a", "b"))
    }
    Components.eagerCheckpoint = true
    val eagerJobs =
      try jobsFor("cc-eager") {
        Components.connectedComponents(chain.toDF("a", "b"))
      } finally Components.eagerCheckpoint = false
    assert(lazyJobs > 0)
    assert(lazyJobs < eagerJobs,
      s"lazy checkpointing must save the per-round materialization action: " +
        s"lazy=$lazyJobs jobs vs eager=$eagerJobs")
    // and the round count itself is the log-diameter invariant, directly:
    // a 65-node chain needs ~log2(64) pointer-jump rounds + 1 stable round
    val (_, stats) = Components.connectedComponentsInstrumented(chain.toDF("a", "b"))
    assert(stats.length <= 8, s"expected <= 8 rounds on a 65-node chain, got ${stats.length}")
  }
}
