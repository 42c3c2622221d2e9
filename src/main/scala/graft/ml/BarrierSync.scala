package graft.ml

import org.apache.spark.BarrierTaskContext
import org.apache.spark.sql.SparkSession

/** Barrier-execution primitives (SURVEY M7/M8).
  *
  * The reference bootstraps its gradient mesh with three driver-round-trip
  * jobs — rank→address collect, broadcast back, connect
  * (CaffeOnSpark.setupTraining:105-158) — and hand-rolls a sync barrier
  * through the JNI layer (CaffeProcessor.scala:180-189). Spark's barrier
  * execution mode provides both as primitives: `allGather` IS the address
  * exchange (one stage, no driver hop per rank), `barrier()` IS the sync
  * point. This module wraps them for training loops that need gang
  * scheduling (e.g. if a future engine re-introduces peer-to-peer state).
  */
object BarrierSync {

  /** All-gather a per-rank string across a gang-scheduled stage; every rank
    * receives the full rank-ordered list (the reference's address table).
    */
  def allGather(spark: SparkSession, parts: Int, message: Int => String): Seq[Seq[String]] =
    spark.sparkContext.parallelize(0 until parts, parts)
      .barrier()
      .mapPartitions { _ =>
        val ctx = BarrierTaskContext.get()
        val all = ctx.allGather(message(ctx.partitionId()))
        Iterator(all.toSeq)
      }
      .collect().toSeq

  /** Run a per-rank body with a sync barrier before and after (M8: "align
    * executors before consuming partitions").
    */
  def synchronized[T: scala.reflect.ClassTag](
      spark: SparkSession, parts: Int)(body: Int => T): Seq[T] =
    spark.sparkContext.parallelize(0 until parts, parts)
      .barrier()
      .mapPartitions { _ =>
        val ctx = BarrierTaskContext.get()
        ctx.barrier()
        val out = body(ctx.partitionId())
        ctx.barrier()
        Iterator(out)
      }
      .collect().toSeq
}
