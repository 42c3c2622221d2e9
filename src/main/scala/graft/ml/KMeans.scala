package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * behind the IVF coarse quantizer (q42). Analogous role to the reference's
  * training loop (CaffeOnSpark.scala:164-238) but expressed as DataFrame
  * plans end to end.
  *
  * Cross-engine determinism (the properties the oracle relies on):
  *   - centroids are element-wise means computed in exact DECIMAL(38,9)
  *     (order-independent sums — safe under shuffles and partial aggs),
  *     projected to double only at the end;
  *   - distances are sequential left-to-right double folds (identical IEEE
  *     evaluation in any engine);
  *   - argmin ties break on the smaller cell id via struct ordering.
  *
  * Scale notes: `centroids` shards the (cell, idx) key space (no dense
  * per-executor buffer; same shape as q26); `assign` broadcasts the k·dim
  * centroid table and reduces per vector with a vec_id-keyed partial
  * aggregate — the embedding itself stays OUT of the shuffle key, riding
  * as an aggregation-buffer payload (first()).
  */
object KMeans {

  /** Element-wise decimal-exact mean per `keyCol` → (c_label, centroid).
    * The exact sum runs as Sum128 over scale-9 unscaled longs
    * (Decimal9Nanos; bit-identical to sum(CAST(v AS DECIMAL(18,9))) — see
    * Sum128.scala — without a per-row Decimal in the aggregate hash map).
    */
  def centroids(vecs: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.graft.SumExpressions.{decimal9_nanos, sum128Nanos}
    vecs
      .select(col(keyCol).as("c_label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy(col("c_label"), col("idx"))
      .agg((sum128Nanos(decimal9_nanos(col("v").cast(DoubleType)))
        .cast(DoubleType) / count(lit(1))).as("m"))
      .groupBy(col("c_label"))
      .agg(expr("transform(array_sort(collect_list(struct(idx, m))), s -> s.m)").as("centroid"))
  }

  /** Squared L2 distance, sequential double fold (engine-stable). */
  private val dist = expr(
    "aggregate(zip_with(embedding, centroid, (x, c) -> " +
      "(CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), " +
      "CAST(0.0 AS DOUBLE), (a, b) -> a + b)")

  /** Assign every vector to its nearest centroid →
    * (vec_id, label, embedding, cell). The reduction groups on vec_id ONLY:
    * a wide group key carrying the embedding array would hash/compare
    * 64 floats per row in the exchange; as a first() payload it moves once
    * per map-side partial instead.
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("d", dist)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("c_label"))).as("best"),
        first(col("label")).as("label"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("best.c_label").as("cell"))

  /** Centroid table collected to the driver as (cell, centroid) pairs
    * sorted by cell id. k·dim doubles — broadcast-scale even at 100 TB
    * (a coarse quantizer is k ≤ 65536 cells × dim floats), and the
    * prerequisite for the map-only [[assignWith]].
    */
  def collectCentroids(cents: DataFrame): Seq[(Long, Seq[Double])] =
    cents.select(col("c_label").cast(LongType), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .toSeq

  /** The per-centroid (distance, cell) structs as a literal-array column:
    * distances are the same sequential double fold as [[dist]], so the
    * argmin/ordering downstream is bit-identical to the crossJoin form.
    */
  private def distStructs(cents: Seq[(Long, Seq[Double])]): Column = {
    val centArr = array(cents.map { case (l, c) =>
      struct(lit(l).as("c_label"), array(c.map(lit(_)): _*).as("centroid"))
    }: _*)
    transform(centArr, c => struct(
      aggregate(
        zip_with(col("embedding"), c.getField("centroid"),
          (x, cc) => (x.cast(DoubleType) - cc) * (x.cast(DoubleType) - cc)),
        lit(0.0), (a, b) => a + b).as("d"),
      c.getField("c_label").as("c_label")))
  }

  /** Map-only assignment against driver-collected centroids: per-row
    * argmin with struct-min tie semantics (smaller cell id), like
    * [[assign]] — no crossJoin rows, no exchange. The argmin runs on the
    * native [[org.apache.spark.sql.graft.NearestCentroid]] expression (one
    * allocation-free codegen loop; bit-identical to the compose form by
    * construction, property-tested in KMeansSpec). This is the 100-TB IVF
    * shape: assignment is the ingest-time map with broadcast centroids;
    * [[assign]] remains for centroid tables too large to collect.
    */
  def assignWith(vecs: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    vecs.withColumn("cell",
        org.apache.spark.sql.graft.VectorExpressions.nearest_centroid(col("embedding"), cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cell"))

  /** [[probeCells]] against driver-collected centroids: sort the per-cell
    * distance structs and take the nprobe nearest — map-only, same
    * (d, cell) ordering as the window form.
    */
  def probeCellsWith(vecs: DataFrame, cents: Seq[(Long, Seq[Double])],
      nprobe: Int): DataFrame =
    vecs
      .select(col("vec_id"),
        posexplode(slice(array_sort(distStructs(cents)), 1, nprobe)))
      .select(col("vec_id"), col("col.c_label").as("cell"),
        (col("pos") + 1).as("probe_rank"))

  /** Driver-side probe cells for an already-collected query vector: the
    * same sequential-fold distances and (d, cell) tie ordering as
    * [[probeCellsWith]], computed as plain Scala over the collected
    * centroid table — when both the query and the centroids are on the
    * driver, the probe list is k·dim flops and deserves no Spark job.
    */
  def probeCellsLocal(qv: Seq[Float], cents: Seq[(Long, Seq[Double])],
      nprobe: Int): Seq[Long] =
    cents.map { case (cl, c) =>
      var d = 0.0
      var i = 0
      while (i < c.length) {
        val x = qv(i).toDouble - c(i)
        d += x * x
        i += 1
      }
      (d, cl)
    }.sorted.take(nprobe).map(_._2)

  /** Lloyd iterations from a warm-start assignment column: each step
    * recomputes cell centroids from the current assignment and reassigns.
    * Returns the final assignment (vec_id, label, embedding, cell).
    */
  def lloyd(vecs: DataFrame, warmStartCol: String, steps: Int): DataFrame = {
    var assigned = assign(vecs, centroids(
      vecs.withColumn("__k", col(warmStartCol)), "__k"))
    var i = 1
    while (i < steps) {
      assigned = assign(vecs, centroids(assigned, "cell"))
      i += 1
    }
    assigned
  }

  /** The `nprobe` nearest cells per vector → (vec_id, cell, probe_rank).
    * The IVF probe list: a query searches its top-nprobe cells, trading a
    * little extra read (nprobe/k of the corpus) for recall on vectors that
    * sit near a Voronoi boundary. Ties break on cell id like [[assign]].
    */
  def probeCells(vecs: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d"), col("c_label"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("d", dist)
      .withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nprobe)
      .select(col("vec_id"), col("c_label").as("cell"), col("probe_rank"))
  }

  /** Mean within-cluster squared distance of an assignment (diagnostic). */
  def sse(assigned: DataFrame): Double =
    assigned
      .join(broadcast(centroids(assigned, "cell").withColumnRenamed("c_label", "cell")), "cell")
      .withColumn("d", dist)
      .agg(avg(col("d"))).head().getDouble(0)
}
