package graft

import org.apache.spark.sql.functions._

/** The trained PQ sub-codebook layout (sources/PqCodebooks) and its q92
  * consumer: the Lloyd-step payoff is THEORY-guaranteed (recentering
  * minimizes within-cell SSE for a fixed assignment, reassignment can only
  * lower it further), so the spec pins it as an invariant — a refactor
  * that breaks the refinement cannot pass by luck.
  */
class PqCodebooksSpec extends SparkSpec {

  private val M = graft.sources.PqCodebooks.M
  private val D = graft.sources.PqCodebooks.D

  private def sliceSse(vecs: Array[Array[Float]],
      cb: Seq[Seq[(Long, Seq[Double])]]): Double = {
    var total = 0.0
    for (v <- vecs; sub <- 0 until M) {
      var best = Double.MaxValue
      for ((_, c) <- cb(sub)) {
        var d = 0.0
        var i = 0
        while (i < D) {
          val x = v(sub * D + i).toDouble - c(i)
          d += x * x
          i += 1
        }
        if (d < best) best = d
      }
      total += best
    }
    total
  }

  test("refined sub-codebooks strictly improve quantization SSE over sliced warm start") {
    val emb = Tables(spark, sf, "embeddings")
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val (c0, _) = graft.sources.IvfCentroids(spark, sf)
    val warm = (0 until M).map(sub =>
      c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
    val refined = graft.sources.PqCodebooks(spark, sf)
    val sseWarm = sliceSse(vecs, warm)
    val sseRefined = sliceSse(vecs, refined)
    assert(sseRefined <= sseWarm,
      s"Lloyd monotonicity violated: refined $sseRefined > warm $sseWarm")
    // and the improvement is material on this corpus, not an epsilon
    assert(sseRefined < sseWarm * 0.999,
      s"refinement changed nothing: $sseRefined vs $sseWarm")
  }

  test("each refined centroid is the mean of its warm-assigned members' slices") {
    val emb = Tables(spark, sf, "embeddings")
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val (c0, _) = graft.sources.IvfCentroids(spark, sf)
    val warm = (0 until M).map(sub =>
      c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
    val refined = graft.sources.PqCodebooks(spark, sf)
    for (sub <- Seq(0, 3, 7)) {
      // warm assignment, same argmin/tie rules as NearestCentroid
      val members = vecs.groupBy { v =>
        warm(sub).minBy { case (l, c) =>
          var d = 0.0
          var i = 0
          while (i < D) {
            val x = v(sub * D + i).toDouble - c(i)
            d += x * x
            i += 1
          }
          (d, l)
        }._1
      }
      for ((lab, cen) <- refined(sub)) {
        val mem = members(lab)
        for (i <- 0 until D) {
          val mean = mem.map(_(sub * D + i).toDouble).sum / mem.length
          assert(math.abs(cen(i) - mean) < 1e-6,
            s"sub=$sub cell=$lab dim=$i: centroid ${cen(i)} vs member mean $mean")
        }
      }
    }
  }

  test("a sub-codebook cell that attracts no members drops out; encoding still total") {
    import spark.implicits._
    // two labels whose SUBSPACE-0 slices are IDENTICAL: both warm slice
    // centroids coincide there, the argmin tie breaks to label 0, so
    // label 1's cell in subspace 0 empties after assignment — the
    // refined table must simply lack that row (both engines agree by
    // construction) and every vector must still encode against the
    // surviving cells.
    val dim = M * D
    val rows = (0 until 24).map { i =>
      val label = i % 2
      val v = Array.tabulate(dim) { j =>
        if (j < D) 0.5f // subspace 0: identical for both labels
        else if (label == 0) (0.1f * ((j + i) % 5)) else (0.9f - 0.1f * ((j + i) % 5))
      }
      (i.toLong, label.toLong, v.toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("pq-empty").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cb = graft.sources.PqCodebooks(spark, dir)
    assert(cb(0).map(_._1) == Seq(0L),
      s"subspace 0 should keep only cell 0, got ${cb(0).map(_._1)}")
    assert(cb.drop(1).forall(_.nonEmpty))
    // encoding is total over the surviving cells (no lookup can miss)
    val coded = graft.sources.PqCodebooks.encodeDelta(spark, dir,
      spark.read.parquet(s"$dir/embeddings.parquet"))
      .select("pq_code").collect().map(_.getLong(0))
    assert(coded.length == 24 && coded.forall(c => c >= 0 && c < (1L << 32)))
    // subspace-0 code is 0 for every vector (the only surviving cell)
    assert(coded.forall(c => (c & 0xf) == 0L))
  }

  test("encodeDelta packs appended vectors identically to the batch encoder") {
    val emb = Tables(spark, sf, "embeddings").limit(20)
    val delta = graft.sources.PqCodebooks.encodeDelta(spark, sf, emb)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch twin: the q92/pq_encode construction over the same rows
    val cb = graft.sources.PqCodebooks(spark, sf)
    val batch = emb.select(col("vec_id"),
      (0 until M).map { sub =>
        org.apache.spark.sql.graft.VectorExpressions
          .nearest_centroid(col("embedding"), cb(sub), offset = sub * D) *
          lit(1L << (4 * sub))
      }.reduce(_ + _).cast("long").as("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(delta == batch)
  }

  test("q92: 10 rows, pq_code in 8×4-bit range, exact-dot ordered") {
    val rows = graft.queries.VectorOps.q92AnnPqTrained.fn(spark, sf).collect()
    assert(rows.length == 10)
    val dots = rows.map(_.getDouble(rows.head.fieldIndex("dot")))
    assert(dots.sameElements(dots.sortBy(-_)), "re-rank order must be by exact dot desc")
    rows.foreach { r =>
      val code = r.getLong(r.fieldIndex("pq_code"))
      assert(code >= 0L && code < (1L << 32), s"pq_code $code out of range")
    }
  }
}
