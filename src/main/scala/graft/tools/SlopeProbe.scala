package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool (not in the driver contract): measures the CANDIDATE VOLUME of
  * the blocked/banded dedup queries at two scale factors, from the executed
  * plan's own `numOutputRows` metrics — the empirical check that the
  * sub-quadratic scale story (SCALE.md) rests on. A blocking scheme is
  * linear-ish iff its candidate row count grows ~proportionally with the
  * corpus; a quadratic leak shows up as a ~100× jump across a 10× SF step.
  *
  * Output: for each query × SF, the top row-producing plan nodes
  * (joins/expansions), so the candidate stage is read off the real plan
  * rather than re-derived.
  */
object SlopeProbe {

  private val Targets = Seq("q21_ngram_jaccard", "q28_embedding_neardup",
    "q31_minhash_lsh", "q39_simhash_neardup", "q46_embedding_neardup_lsh",
    "q67_span_dedup", "q68_leakage_safe_split", "q69_chunk_windows",
    "q70_split_contamination", "q71_image_neardup", "q74_semdedup",
    "q86_quant_audit", "q92_ann_pq_trained", "q93_importance_resample",
    "q96_repetition_filter", "q97_bigram_zipf", "q98_source_dup_matrix",
    "q99_packing_audit", "q100_minhash_calibration",
    "q104_cluster_purity", "q105_boilerplate_spans", "q106_pq_distortion",
    "q107_simhash_calibration", "q108_ivf_cell_audit", "q109_cluster_density",
    "q110_curriculum_schedule", "q111_source_dedup_cost",
    "q112_retrieval_agreement", "q114_canonical_best",
    "q115_df_spectrum", "q116_fingerprint_profile", "q117_vocab_growth",
    "q118_bigram_perplexity", "q119_lm_disagreement")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def walk(p: SparkPlan): Seq[SparkPlan] = (p.collect {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case imts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // q21 persists its posting lists: the shingle explode/aggregate
        // execute inside the cached subtree, whose metrics live on the
        // relation's cachedPlan, not in this query's tree
        imts +: walk(imts.relation.cachedPlan)
      case n => Seq(n)
    }).flatten

    for (sfDir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.Tables(spark, sfDir, "documents").count()
      val embs = graft.Tables(spark, sfDir, "embeddings").count()
      println(s"== corpus @ ${sfDir.split('/').last}: documents=$docs embeddings=$embs")
    }
    // optional args restrict the run to named queries (re-measuring one
    // query's slope shouldn't pay the full sweep)
    val targets = if (args.nonEmpty) Targets.filter(args.contains) else Targets
    for (sfDir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         name <- targets) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // drive THROUGH df.queryExecution (a write re-plans internally and
      // would leave these metrics untouched); results are small
      df.collect()
      val rows = walk(df.queryExecution.executedPlan)
        .flatMap(n => n.metrics.get("numOutputRows")
          .map(m => (n.nodeName, m.value)))
        .filter { case (nn, _) =>
          nn.contains("Join") || nn.contains("Generate") || nn.contains("Expand") }
        .sortBy(-_._2)
      println(s"== $name @ ${sfDir.split('/').last}")
      rows.take(8).foreach { case (nn, v) => println(f"   $v%12d  $nn") }
      graft.Caches.clearAll(spark)
    }
    spark.stop()
  }
}
