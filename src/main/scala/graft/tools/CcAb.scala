package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Caches, SparkEntry}
import graft.operators.Components

/** Round-10 A/B: adjudicate the q62/q63 bench regression that round 9
  * recorded coincident with the Components lazy-checkpoint refactor.
  *
  * Design: ALTERNATE eager and lazy checkpointing within ONE JVM — same
  * Spark session, same codegen cache, interleaved in time — so thermal
  * drift (this box slows 2x under sustained load) hits both arms equally
  * instead of whichever variant ran second. Measurement is identical to
  * Bench: noop-write materialization, Caches.clearAll between runs.
  *
  * Not registered in the driver contract; output is read by a human and
  * recorded in the Components scaladoc + SCALE.md.
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q62_dedup_clusters", "q63_canonical_corpus")
    def runOnce(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Caches.clearAll(spark)
      n -> s
    }.toMap

    // warmup both arms once (codegen/JIT) before measuring
    Components.eagerCheckpoint = true; runOnce()
    Components.eagerCheckpoint = false; runOnce()

    val samples = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Map[String, Double])]
    (1 to reps).foreach { i =>
      Seq(i % 2 == 0, i % 2 == 1).foreach { eager => // alternate order per rep
        Components.eagerCheckpoint = eager
        val r = runOnce()
        samples += ((eager, r))
        println(f"[ccab] rep=$i eager=$eager q62=${r(names(0))}%.3f q63=${r(names(1))}%.3f total=${r.values.sum}%.3f")
      }
    }
    def stats(eager: Boolean): (Double, Double, Double) = {
      val totals = samples.filter(_._1 == eager).map(_._2.values.sum).sorted
      (totals(totals.size / 2), totals.min, totals.max)
    }
    val (em, emin, emax) = stats(true)
    val (lm, lmin, lmax) = stats(false)
    println(f"[ccab] EAGER  median=$em%.3f min=$emin%.3f max=$emax%.3f (n=$reps)")
    println(f"[ccab] LAZY   median=$lm%.3f min=$lmin%.3f max=$lmax%.3f (n=$reps)")
    println(s"[ccab] winner=${if (lm <= em) "lazy" else "eager"}")
    spark.stop()
  }
}
