package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The ANN coarse-quantizer codebooks, trained once per corpus and
  * persisted: `c0` (the label-mean centroid table — q58's sub-codebook
  * source, q60's outlier reference, the k-means warm start) and `c1` (one
  * Lloyd refinement of c0 — the IVF cell table q42 and the q53 meter's ivf
  * arm probe). Production ANN trains its quantizer at ingest and every
  * query loads the codebook; before this layout each of q42/q53/q58/q60
  * re-trained the same tables per execution (~0.4 s per table warm at
  * sf0.1 — tools/Q53Probe), which at suite scale re-paid the most
  * expensive non-scan work four times per bench pass.
  *
  * The stored values are EXACTLY the tables the queries computed inline
  * (KMeans.centroids' decimal-exact means projected to double; parquet
  * round-trips doubles bit-for-bit), so every oracle comparison is
  * unchanged. k·dim doubles per table — driver/broadcast scale at any
  * corpus size. Stamping/atomicity/reaping are [[DerivedLayout]]'s.
  */
object IvfCentroids {

  /** Bump when the centroid derivation changes (k-means math, key domain,
    * refinement depth).
    */
  private val Version = "v1"

  type Table = Seq[(Long, Seq[Double])]

  // collected-table memo: the layout read is a tiny job, but q53 alone
  // loads the codebook on every bench run — (session, fingerprinted path)
  // keys make staleness impossible, like Tables' plan cache
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Table, Table)]

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("cent", Version, dir, Seq(s"$dir/embeddings.parquet"))

  /** (c0 label-mean table, c1 refined cell table), sorted by label like
    * [[graft.ml.KMeans.collectCentroids]].
    */
  def apply(spark: SparkSession, dir: String): (Table, Table) = {
    val target = layoutPath(dir)
    cache.getOrElseUpdate((spark, target), {
      import graft.ml.KMeans
      val df = DerivedLayout(spark, target) { tmp =>
        val emb = graft.Tables(spark, dir, "embeddings")
        val c0df = KMeans.centroids(emb.withColumn("__k", col("label")), "__k")
        val c0 = KMeans.collectCentroids(c0df)
        c0df.select(lit("c0").as("stage"),
            col("c_label").cast("long").as("c_label"), col("centroid"))
          .unionByName(
            KMeans.centroids(KMeans.assignWith(emb, c0), "cell")
              .select(lit("c1").as("stage"),
                col("c_label").cast("long").as("c_label"), col("centroid")))
          .write.mode("overwrite").parquet(tmp)
      }
      val rows = df.select("stage", "c_label", "centroid").collect()
      def table(stage: String): Table = rows.filter(_.getString(0) == stage)
        .map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq
      (table("c0"), table("c1"))
    })
  }
}
