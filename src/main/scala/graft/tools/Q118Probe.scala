package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q118Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.queries.TextOps
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val V = TextOps.PplVocab; val C = V + 1
    val f = TextOps.tokenizedNonEmpty(graft.Tables(spark, dir, "documents"))
      .filter(col("dl") >= 2).persist()
    f.count()
    val dims = TextOps.pplDimsFrom(f, V).head()
    val vw = dims.getSeq[String](0); val vc = dims.getSeq[Long](1); val total = dims.getLong(2)
    val cu = (total - vc.sum) +: vc
    (1 to 2).foreach { i =>
      val withCls = f.withColumn("vw", typedLit(vw))
        .withColumn("cls", expr("transform(t, w -> array_position(vw, w))"))
      time(s"cls only $i") { withCls.select(col("cls")).write.format("noop").mode("overwrite").save() }
      time(s"pair pass $i") {
        withCls.select(explode(expr(
          s"transform(slice(cls, 2, size(cls) - 1), (b, i) -> element_at(cls, i + 1) * $C + b)")).as("k"))
          .groupBy("k").agg(count(lit(1))).write.format("noop").mode("overwrite").save()
      }
      val cbLit = (0 until C*C).map(_ => 1L)  // dummy dense table, same shape
      time(s"score only $i") {
        withCls.withColumn("cb", typedLit(cbLit)).withColumn("cu", typedLit(cu))
          .withColumn("total", lit(total))
          .withColumn("nll2_raw", expr(TextOps.bigramNllExpr(C)))
          .select(col("doc_id"), col("nll2_raw")).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
