package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not in the driver contract): measures connected-components
  * ROUND GROWTH vs scale — the one SCALE.md slope SlopeProbe's candidate
  * counts don't cover. Pointer jumping claims O(log diameter) rounds; this
  * probe records rounds-to-converge and wall per round on
  *
  *  - the real q21 pair graph at sf0.01 vs sf0.1 (the q62 input: dense
  *    near-clique structure, small diameter),
  *  - the q63 strong-edge graph (jaccard >= 0.5) at both SFs,
  *  - synthetic CHAINS of 1k / 10k / 100k nodes — the worst diameter
  *    shape, where a linear-round algorithm is 1000× over budget and the
  *    log claim either holds or fails loudly.
  *
  * Findings land in SCALE.md; rounds must grow ~log(diameter), i.e. +3-4
  * per 10× chain length, and stay flat-ish across SFs on the real graphs.
  */
object CcProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def probe(name: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val (labels, stats) =
        graft.operators.Components.connectedComponentsInstrumented(edges)
      val nComp = labels.select("component").distinct().count()
      val total = (System.nanoTime() - t0) / 1000000L
      println(f"== $name%-28s edges=$nEdges%7d components=$nComp%6d " +
        f"rounds=${stats.length}%2d total=${total}ms " +
        s"perRound=[${stats.map { case (c, ms) => s"$c@${ms}ms" }.mkString(", ")}]")
    }

    for (sfDir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val sf = sfDir.split('/').last
      val pairs = graft.queries.TextOps.q21NgramJaccard.fn(spark, sfDir)
      probe(s"q21-full-graph @ $sf", pairs.select("a", "b"))
      probe(s"q63-strong-edges @ $sf",
        pairs.filter(col("jaccard") >= 0.5).select("a", "b"))
      graft.Caches.clearAll(spark)
    }

    for (n <- Seq(1000L, 10000L, 100000L)) {
      val chain = spark.range(n - 1).select(
        col("id").as("a"), (col("id") + 1).as("b"))
      probe(s"chain-$n", chain)
    }
    spark.stop()
  }
}
