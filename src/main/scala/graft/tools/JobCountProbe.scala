package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-13 probe: count jobs/stages/tasks and aggregate task time for one
  * query execution, so per-stage scheduling overhead is separable from real
  * plan cost (VERDICT r12 Next-round item 8's "overhead-honest" lens,
  * pointed at a single query). Not registered in the driver contract.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = args.headOption.getOrElse("q53_ann_recall")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        println(f"[probe]   stage ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
          f"${(s.stageInfo.completionTime.getOrElse(0L) - s.stageInfo.submissionTime.getOrElse(0L))}%5d ms  " +
          s.stageInfo.name.take(90))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    }

    def run(label: String): Unit = {
      jobs = 0; stages = 0; tasks = 0; taskMs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(qname)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain listener bus
      println(f"[probe] $label $qname wall=$wall%.3f jobs=$jobs stages=$stages " +
        f"tasks=$tasks taskTime=${taskMs / 1000.0}%.2f s")
      graft.Caches.clearAll(spark)
    }
    run("warmup"); spark.listenerManager // keep
    spark.sparkContext.addSparkListener(listener)
    run("warm  ")
    spark.stop()
  }
}
