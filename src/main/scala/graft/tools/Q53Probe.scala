package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 probe: decompose q53's wall time by arm so the optimization
  * targets the measured bottleneck, not the assumed one. Mirrors the
  * stages of queries/VectorOps.q53AnnRecall with the same bench session
  * settings; not registered in the driver contract.
  */
object Q53Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ml.KMeans

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q53probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { pass =>
      println(s"[q53probe] === pass $pass ===")
      val emb = graft.Tables(spark, sfDir, "embeddings")
      val corpus = emb.filter(col("vec_id") >= 8)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val fdot = (a: String, b: String) =>
        org.apache.spark.sql.graft.VectorExpressions.float_dot(col(a), col(b))
      def top10(cands: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(fdot("embedding", "qv").desc, col("vec_id"))
        cands.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).select("qid", "vec_id")
      }
      time("exact arm")(noop(top10(corpus.crossJoin(broadcast(queries)))))
      val (c0, c1) = time("centroid layout")(graft.sources.IvfCentroids(spark, sfDir))
      time("a1 assign scan")(noop(KMeans.assignWith(emb, c1)))
      val withBucket = emb.withColumn("bucket", graft.queries.VectorOps.lshBucket)
      time("bucket scan (x2 arms)")(noop(withBucket))
      time("corpus count")(corpus.count())
      // pq arm in isolation: code the corpus, ADC-rank via the 8-query
      // crossJoin window, top-100
      val M = 8; val D = 8
      val cbQ = (0 until M).map(sub =>
        c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
      val qvs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val pqLabels = cbQ.head.map(_._1)
      def lutFor(qv: Seq[Float]): Seq[Seq[Double]] = (0 until M).map { sub =>
        cbQ(sub).map { case (_, c) =>
          var acc = 0.0; var i = 0
          while (i < D) { acc += qv(sub * D + i).toDouble * c(i); i += 1 }
          acc
        }
      }
      val lutsByQ = qvs.toSeq.map { case (qid, qv) => (qid, lutFor(qv)) }
      val adcMaps = (0 until M).map { sub =>
        map_from_arrays(
          lit(lutsByQ.flatMap { case (qid, _) => pqLabels.map(l => qid * 16 + l) }.toArray),
          lit(lutsByQ.flatMap { case (_, luts) => luts(sub) }.toArray))
      }
      val codedC = corpus.select(Seq(col("vec_id"), col("embedding")) ++
        (0 until M).map(sub => org.apache.spark.sql.graft.VectorExpressions
          .nearest_centroid(col("embedding"), cbQ(sub), offset = sub * D)
          .as(s"code_$sub")): _*)
      time("pq coded scan")(noop(codedC))
      val qidDf = spark.createDataFrame(qvs.toSeq.map(q => Tuple1(q._1))).toDF("qid")
      val adcCol = (0 until M).foldLeft(lit(0.0)) { (acc, sub) =>
        acc + element_at(adcMaps(sub), col("qid") * 16 + col(s"code_$sub"))
      }
      val wAdc = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))
      time("pq adc window")(noop(codedC.crossJoin(broadcast(qidDf))
        .withColumn("adc", adcCol)
        .withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= 100)
        .select("qid", "vec_id", "embedding")))
      graft.Caches.clearAll(spark)
    }
    spark.stop()
  }
}
