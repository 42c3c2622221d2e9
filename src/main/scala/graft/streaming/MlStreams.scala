package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Streaming twins of the model-lifecycle forward passes: featurization
  * (M3) is select-only column arithmetic — the weights ride the plan as
  * literals (the broadcast-equivalent for O(k·dim) constants) — so the
  * SAME implementation the batch path uses runs unchanged over an
  * unbounded source. This is continuous inference over an ingest stream:
  * train at a checkpoint (batch, q87's surface), deploy the snapshot,
  * featurize everything that lands. No state, no watermark — per-row
  * map; the micro-batch boundary is invisible by construction
  * (StreamingSpec pins streamed ≡ batch row-for-row for both heads).
  */
object MlStreams {

  /** The embeddings-table stream schema (vec_id, label, embedding). */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Binary head (M3): (SampleID, ip1, prob) over a streaming frame. */
  def features(stream: DataFrame, dim: Int, weights: Array[Double],
      idCol: String = "vec_id", featCol: String = "embedding"): DataFrame =
    new graft.ml.LogisticRegression(dim).features(stream, idCol, featCol, weights)

  /** Multi-output softmax head (M3, k classes): (SampleID, ip1 = k
    * logits, prob = k-way softmax) over a streaming frame.
    */
  def softmaxFeatures(stream: DataFrame, dim: Int, numClasses: Int,
      weights: Array[Double], idCol: String = "vec_id",
      featCol: String = "embedding"): DataFrame =
    new graft.ml.SoftmaxRegression(dim, numClasses)
      .features(stream, idCol, featCol, weights)

  /** Streaming twin of the `pq_encode` curation stage: arriving vectors
    * compress to their packed M×4-bit PQ code against the corpus's
    * persisted [[graft.sources.PqCodebooks]] layout — trained once at
    * ingest, HELD FIXED here exactly as the batch stage and
    * [[graft.sources.PqCodebooks.encodeDelta]] hold it (codes stay
    * comparable across the whole corpus; drift is an explicit re-train +
    * rebuild, never an online update). MAP-ONLY on the stream side: the
    * codebooks ride the plan as literals inside the codegen'd
    * nearest-centroid fold, so there is no state, no watermark, no
    * shuffle, and a streamed row's `pq_code` is BIT-IDENTICAL to the
    * batch stage's for the same embedding (StreamingSpec pins streamed ≡
    * batch over the full test corpus). Same output contract as the
    * stage: the embedding column is REPLACED by the 8-byte code — the
    * compress-on-ingest shape that makes the downstream store d·4/64×
    * smaller than raw floats.
    */
  def pqEncode(stream: DataFrame, corpusDir: String,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    val cb = graft.sources.PqCodebooks(stream.sparkSession, corpusDir)
    stream.withColumn("pq_code",
      when(col(embCol).isNull, lit(null))
        .otherwise(graft.sources.PqCodebooks.pqCodeCol(cb, col(embCol)))
        .cast("long"))
      .drop(embCol)
  }

  /** Streaming maintenance of q90's second-moment cells — the whitening/
    * PCA statistics kept CURRENT as vectors land, instead of a periodic
    * batch pass: per-row upper-triangle terms (exact nano-quantized
    * longs, so merges are order-free integer adds), one grouped
    * aggregate in complete mode. State is the d·(d+1)/2 cell table —
    * O(d²) regardless of stream length, the count-min/heavy-hitter
    * discipline applied to model statistics. After any micro-batch the
    * cells equal the batch q90 over everything ingested (StreamingSpec
    * pins it), so a whitening matrix derived from them is the one the
    * batch pipeline would compute.
    *
    * ACCUMULATOR WIDTH: batch q90 selects its width at plan time from
    * the stamped corpus count (long sum exact to N ≈ 9.2e9 unit-scale
    * nano-terms, [[org.apache.spark.sql.graft.Sum128]] past it) — but
    * complete-mode state never resets, and an unbounded stream has no
    * plan-time N to select from, so the stream side is the side that
    * WILL eventually cross the long bound. Default is therefore the
    * 128-bit path (exact intermediates at any stream length, BIGINT-cast
    * at finalization — the same escalation as the batch wide path and
    * the same discipline as [[centroidCells]]' sum128Nanos); `wide =
    * false` keeps the plain ANSI long sum for bounded replays that want
    * the narrow plan, failing loudly (never corrupting) past the bound.
    */
  def momentCells(stream: DataFrame, featCol: String = "embedding",
      wide: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    // r22: the SAME MomentCellsAgg the batch q90 aggregates with (one
    // implementation, both move) — per-row partial moment vectors, no
    // per-term explode; streaming state is ONE (sums, nlen) buffer pair
    // instead of d·(d+1)/2 keyed cell rows, still O(d²) total.
    stream
      .agg(org.apache.spark.sql.graft.MomentCellsAgg
        .moment_cells(col(featCol), wide).as("mc"))
      .select(explode(col("mc")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        col("c.n").as("n"), col("c.s_n9").as("s_n9"))
  }

  /** Streaming maintenance of q106's PQ distortion cells: arriving
    * vectors score their per-subspace nano-quantized reconstruction
    * error against the corpus's HELD-FIXED trained
    * [[graft.sources.PqCodebooks]] (the pqEncode rule — codes and their
    * distortion stay comparable across the whole stream; drift is an
    * explicit re-train + rebuild), one grouped aggregate in complete
    * mode. State is M = 8 cells — O(1) regardless of stream length —
    * each carrying (n_vecs, sum_err_n9, max_err_n9), the live
    * index-health readout that tells an operator WHEN the held-fixed
    * codebook has drifted off the incoming distribution (rising
    * distortion against a fixed quantizer is exactly distribution
    * shift). The error term is literally q106's
    * ([[graft.sources.PqCodebooks.errN9Col]] — one definition), so after
    * any micro-batch the cells equal the batch meter's `pqt` arm over
    * everything ingested (StreamingSpec pins it). The sum is
    * [[org.apache.spark.sql.graft.Sum128]] unconditionally — the
    * momentCells rule: complete-mode state never resets and per-vector
    * terms reach ~10⁹, so an unbounded stream crosses the long bound.
    */
  def distortionCells(stream: DataFrame, corpusDir: String,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    val cb = graft.sources.PqCodebooks(stream.sparkSession, corpusDir)
    stream
      .select(posexplode(array(
        (0 until graft.sources.PqCodebooks.M).map(sub =>
          graft.sources.PqCodebooks.errN9Col(cb, sub, col(embCol))): _*))
        .as(Seq("sub", "e")))
      .groupBy(col("sub").cast("long").as("sub"))
      .agg(count(lit(1)).as("n_vecs"),
        org.apache.spark.sql.graft.SumExpressions.sum128(col("e"))
          .cast("long").as("sum_err_n9"),
        max(col("e")).as("max_err_n9"))
  }

  /** Streaming maintenance of the per-label centroid cells — q26's mean
    * table (and q103's cartography input) kept CURRENT as labeled
    * vectors land: per (label, idx), the exact decimal-scale-9 component
    * sum (the same [[org.apache.spark.sql.graft.Sum128]] accumulator the
    * batch cells use — merges are order-free integer adds, so
    * micro-batch boundaries are invisible) and the count, one grouped
    * aggregate in complete mode. State is the |labels|·d cell table —
    * O(dims), not O(stream). After any micro-batch `s / n` equals batch
    * q26's mean over everything ingested (StreamingSpec pins cell
    * equality), so a centroid matrix derived from the cells is the one
    * the batch pipeline would compute.
    */
  def centroidCells(stream: DataFrame, featCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.SumExpressions.{decimal9_nanos, sum128Nanos}
    stream
      .select(col("label"), posexplode(col(featCol)).as(Seq("idx", "v")))
      .groupBy(col("label"), col("idx").cast("long").as("idx"))
      .agg(sum128Nanos(decimal9_nanos(col("v").cast("double")))
        .cast("string").as("s_d9"),
        count(lit(1)).as("n"))
  }
}
