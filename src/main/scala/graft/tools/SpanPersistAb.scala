package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not in the driver contract): the q67 recompute-vs-persist
  * A/B at SCALE (r22, verdict item 8).
  *
  * q67's `occ` subtree (tokenize + fused 8-gram hash over the corpus) is
  * consumed twice by design — duplicate discovery and the removal probe —
  * and is deliberately not persisted. Every sf0.1 A/B (r13, r21) measured
  * the persist neutral-to-slower, but local[32] materialization costs at
  * 10 MB inputs do not model a cluster; this tool re-runs the SAME A/B on
  * the [[ScaleCanary]] mult× corpus, both arms alternating inside ONE JVM
  * (cross-JVM single-query timings on this box are thermal noise), output
  * checksums asserted equal before timing. SPARK_GRAFT_CPUS sets topology.
  *
  * Usage: runMain graft.tools.SpanPersistAb [mult]
  */
object SpanPersistAb {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = ScaleCanary.ensureCorpus(spark, mult)

    import graft.queries.DedupOps
    def q67 = graft.SparkEntry.queries("q67_span_dedup")(spark, dir)
    // output checksum, not a collect: at mult× the kept_text payload is
    // corpus-sized; bit_xor(xxhash64) per the sum-overflow gotcha
    def checksum(persist: Boolean): Seq[Any] = {
      DedupOps.q67PersistOcc = persist
      val r = q67.agg(
        sum(col("n_tokens")), sum(col("n_dropped")),
        expr("bit_xor(xxhash64(kept_text))")).collect()(0).toSeq
      graft.Caches.clearAll(spark)
      r
    }
    require(checksum(true) == checksum(false),
      "persist and recompute arms disagree — equivalence violated")
    def runOnce(persist: Boolean): Double = {
      DedupOps.q67PersistOcc = persist
      val t0 = System.nanoTime()
      q67.queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.Caches.clearAll(spark)
      t
    }
    runOnce(false); runOnce(true) // warmup both shapes
    val (ps, rs) = (scala.collection.mutable.ArrayBuffer.empty[Double],
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { ps += runOnce(true); rs += runOnce(false) }
      else { rs += runOnce(false); ps += runOnce(true) }
      println(f"[spanpersist] rep=$i persist=${ps.last}%.3f recompute=${rs.last}%.3f")
    }
    def m(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[spanpersist] PERSIST median=${m(ps.toSeq)}%.3f min=${ps.min}%.3f | " +
      f"RECOMPUTE median=${m(rs.toSeq)}%.3f min=${rs.min}%.3f " +
      f"(n=$reps, mult=$mult, cpus=$cpus, checksums equal)")
    DedupOps.q67PersistOcc = false
    spark.stop()
  }
}
