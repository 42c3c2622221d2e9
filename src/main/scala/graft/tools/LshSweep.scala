package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not in the driver contract): sweeps the sign-LSH geometry —
  * plane count × probed-bit count — and reports measured recall@10 and
  * read fraction for the q34/q53 multiprobe against the exact baseline.
  *
  * Key identity that makes the sweep cheap: the margin-directed multiprobe
  * enumerates ALL 2^probeBits sign patterns of the probeBits lowest-|margin|
  * planes, so a corpus vector is a candidate IFF its bucket agrees with the
  * query's on every PINNED (high-margin) bit. Recall/read therefore need no
  * probe-set materialization — one driver pass over the corpus buckets per
  * config. Plane families extend the production splitmix family (j·64+i
  * indexing), so config (16, 12) reproduces the production q34 geometry.
  */
object LshSweep {

  private def mix64(v: Long): Long = {
    var x = v * 0x9E3779B97F4A7C15L
    x ^= (x >>> 31); x *= 0xBF58476D1CE4E5B9L; x ^= (x >>> 27)
    x
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    spark.stop()

    val nq = 8
    val queries = rows.filter(_._1 < nq)
    val corpus = rows.filter(_._1 >= nq)
    val dim = rows.head._2.length

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // exact top-10 per query (the q53 baseline)
    val exact10 = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (vid, v) => (dot(v, qv), vid) }
        .sortBy { case (d, vid) => (-d, vid) }.take(10).map(_._2).toSet
    }.toMap

    println(f"corpus=${corpus.length} queries=$nq dim=$dim sf=$sfDir")
    println("planes probed pinned |   recall@10    | read%")
    for {
      nPlanes <- Seq(16, 18, 20, 22, 24)
      probeBits <- Seq(10, 12, 14, 16) if probeBits < nPlanes && nPlanes - probeBits <= 8
    } {
      val planes = Array.tabulate(nPlanes, dim)((j, i) =>
        (java.lang.Long.remainderUnsigned(mix64((j * 64 + i).toLong), 19).toInt - 9).toFloat)
      def planeDots(v: Array[Float]): Array[Double] = planes.map(p => dot(v, p))
      def bucketOf(ds: Array[Double]): Long =
        ds.zipWithIndex.map { case (d, j) => if (d > 0d) 1L << j else 0L }.sum
      val corpusBuckets = corpus.map { case (vid, v) => vid -> bucketOf(planeDots(v)) }
      var recallSum = 0.0
      var readSum = 0.0
      for ((qid, qv) <- queries) {
        val ds = planeDots(qv)
        val qb = bucketOf(ds)
        // pinned mask = the (nPlanes - probeBits) HIGHEST-|margin| planes
        val probed = ds.map(math.abs).zipWithIndex
          .sortBy { case (a, j) => (a, j) }.take(probeBits).map(_._2).toSet
        val pinnedMask = (0 until nPlanes)
          .filterNot(probed).map(1L << _).sum
        val cands = corpusBuckets.filter { case (_, b) => ((b ^ qb) & pinnedMask) == 0 }
        recallSum += (cands.map(_._1).toSet & exact10(qid)).size / 10.0
        readSum += cands.length.toDouble / corpus.length
      }
      println(f"  $nPlanes%4d   $probeBits%4d   ${nPlanes - probeBits}%4d |     ${recallSum / nq}%.3f      | ${100 * readSum / nq}%5.2f")
    }
  }
}
