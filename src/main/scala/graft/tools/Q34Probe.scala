package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
object Q34Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-34s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val layout = graft.sources.BucketedEmbeddings(spark, dir)
    val q = spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") === 0)
      .select(col("embedding") +: graft.queries.VectorOps.planeDotColsProbe: _*).head
    val qv = q.getSeq[Float](0).toArray
    val probes = graft.queries.VectorOps.probeBucketsProbe((1 to 16).map(q.getDouble))
    println(s"n probes: ${probes.size}")
    (1 to 3).foreach { i =>
      val df = layout
        .filter(col("vec_id") =!= 0 && col("bucket").isin(probes.map(_.toInt): _*))
        .select(col("vec_id"), col("label"), col("bucket").cast(LongType).as("bucket"),
          org.apache.spark.sql.graft.VectorExpressions.float_dot(col("embedding"), lit(qv)).as("dot"))
        .orderBy(col("dot").desc, col("vec_id")).limit(10)
      time(s"plan only $i") { df.queryExecution.executedPlan }
      time(s"execute $i") { df.collect() }
    }
    spark.stop()
  }
}
