package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-subspace RETRAINED product-quantization sub-codebooks, trained once
  * per corpus and persisted: the standard PQ trainer (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search" §III — k-means run
  * independently in each subspace) where q58's codebooks are mere 8-dim
  * slices of the full-vector label centroids. Slicing is cheap but
  * optimizes nothing per subspace; one Lloyd refinement inside each
  * subspace re-centers every sub-codeword on the vectors it actually
  * quantizes, which is where PQ's distortion budget is decided (the
  * round-15 WhitenPqAb measurement motivated this: whitening could not
  * pay precisely because the codebooks were affine images, not retrained).
  *
  * Training (mirrored CTE-for-CTE in q92's oracle):
  *   1. warm start: sub-codebook `sub` = dims [8·sub, 8·sub+8) of the
  *      persisted label-centroid table c0 ([[IvfCentroids]]);
  *   2. assign: every (vector, sub) pair to its nearest warm sub-codeword
  *      (sequential-fold squared L2 over the slice, ties to the smaller
  *      label — one map-only pass computing all 8 codes per row);
  *   3. re-center: each (sub, code) cell's new 8-dim centroid is the
  *      decimal-exact element-wise mean of its members' slices (Sum128
  *      over scale-9 nanos — KMeans.centroids' discipline — so the values
  *      are order-independent under shuffles and bit-identical to the
  *      oracle's sum(DECIMAL(18,9))/count).
  *
  * Plan shape at 100 TB: step 2 is a map over the corpus (broadcast-sized
  * warm codebook, k·dim doubles); step 3 posexplodes to (pos, v) rows but
  * partial-aggregates into M·k·D = 640 (sub, code, idx) cells map-side, so
  * the shuffle moves ~640 rows per partition regardless of corpus size.
  * Like the IVF codebook, the trained table is an ingest-time fact: a
  * delta append encodes against the HELD-FIXED codebook (re-training would
  * silently re-shape every stored code — that is an explicit rebuild via
  * the stamp, never a refresh).
  *
  * A (sub, label) cell that attracts no members in step 2 simply has no
  * row — both engines then encode against the surviving cells only.
  */
object PqCodebooks {

  /** Bump when the training derivation changes (warm start, refinement
    * depth, subspace geometry).
    */
  private val Version = "v1"

  /** Subspace geometry — must match q58/q92's packing (8 subspaces of 8
    * dims; 4-bit code fields require labels < 16).
    */
  val M = 8
  val D = 8

  /** Per subspace: (code label, 8-dim centroid), sorted by label. */
  type SubTable = Seq[Seq[(Long, Seq[Double])]]

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), SubTable]

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("pqcb", Version, dir, Seq(s"$dir/embeddings.parquet"))

  /** Append-delta encoding: delta vectors packed against THIS corpus's
    * HELD-FIXED sub-codebooks — the PQ complement of
    * [[IvfCentroids.assignDelta]] (re-training on the grown corpus would
    * silently re-shape every stored code, so that is an explicit rebuild
    * via the stamp, never a refresh). Map-only over the broadcast-sized
    * codebooks: the input frame plus a packed `pq_code` long.
    */
  def encodeDelta(spark: SparkSession, dir: String,
      delta: org.apache.spark.sql.DataFrame,
      embCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val cb = apply(spark, dir)
    val pqCode = (0 until M).map { sub =>
      org.apache.spark.sql.graft.VectorExpressions
        .nearest_centroid(col(embCol), cb(sub), offset = sub * D) *
        lit(1L << (4 * sub))
    }.reduce(_ + _)
    delta.withColumn("pq_code", pqCode.cast("long"))
  }

  def apply(spark: SparkSession, dir: String): SubTable = {
    val target = layoutPath(dir)
    cache.getOrElseUpdate((spark, target), {
      import org.apache.spark.sql.graft.SumExpressions.{decimal9_nanos, sum128Nanos}
      val df = DerivedLayout(spark, target) { tmp =>
        val emb = graft.Tables(spark, dir, "embeddings")
        val (c0, _) = IvfCentroids(spark, dir)
        val warm: SubTable = (0 until M).map(sub =>
          c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
        // all 8 warm codes per row in one map pass (native argmin per sub)
        val coded = emb.select(
          col("embedding"),
          array((0 until M).map(sub =>
            org.apache.spark.sql.graft.VectorExpressions
              .nearest_centroid(col("embedding"), warm(sub), offset = sub * D)): _*)
            .as("codes"))
        // one aggregation re-centers every cell: (pos, v) → (sub, code, idx)
        coded
          .select(col("codes"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select((col("pos") / D).cast("int").as("sub"),
            pmod(col("pos"), lit(D)).as("idx"),
            element_at(col("codes"), (col("pos") / D).cast("int") + 1).as("code"),
            col("v"))
          .groupBy(col("sub"), col("code"), col("idx"))
          .agg((sum128Nanos(decimal9_nanos(col("v").cast(DoubleType)))
            .cast(DoubleType) / count(lit(1))).as("m"))
          .groupBy(col("sub"), col("code"))
          .agg(expr("transform(array_sort(collect_list(struct(idx, m))), s -> s.m)")
            .as("centroid"))
          .select(col("sub").cast("int").as("sub"),
            col("code").cast("long").as("c_label"), col("centroid"))
          .write.mode("overwrite").parquet(tmp)
      }
      val rows = df.select("sub", "c_label", "centroid").collect()
      (0 until M).map(sub => rows.filter(_.getInt(0) == sub)
        .map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq)
    })
  }
}
