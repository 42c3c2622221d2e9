package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The declarative curation pipeline — the `stages: [...]` job form that
  * gives the LLM-data operators the same config-as-schema surface the
  * train/features/test lifecycle got in round 8 (reference analogue: the
  * prototxt declares the WHOLE dataflow, not just the solver —
  * caffe-grid/.../CaffeOnSpark.scala:27-84 wires source → transform →
  * sinks from the declaration alone). A 100 TB curation run declares
  * exactly this chain:
  *
  * {{{
  * { "source": {"path": "/data", "table": "documents"},
  *   "output": "/out", "outputFormat": "parquet",
  *   "stages": [
  *     {"op": "exact_dedup"},
  *     {"op": "near_dedup", "threshold": 0.5},
  *     {"op": "decontaminate", "holdoutSource": "src19", "minShared": 2},
  *     {"op": "pii_scrub"},
  *     {"op": "quality_filter", "minScore": 0.0},
  *     {"op": "temperature_mix", "alpha": 0.5, "budgetDocs": 300},
  *     {"op": "pack", "tokenBudget": 256} ] }
  * }}}
  *
  * Each stage is a transform over the flowing documents frame and reuses
  * the REGISTERED operator machinery (one implementation, oracle-checked
  * where registered): exact_dedup = q20's canonical-per-content-hash;
  * near_dedup = q21 pairs → q62/q63 pointer-jumped components →
  * canonicalize; decontaminate = q51's capped bipartite posting lists;
  * pii_scrub = q55's fused native RegexScrub; quality_filter = q56's
  * published linear model; stratified_sample = q49's consistent-hash
  * gates; temperature_mix = q57's share^α weights applied as per-language
  * consistent-hash keep rates; pack = q50's shard-keyed window packer.
  *
  * Scale notes: every stage keeps its source operator's plan shape —
  * map-only where the operator is map-only (scrub, filters, sampling),
  * capped/banded where it joins (dedup, decontaminate), dimension-sized
  * driver state (temperature_mix collects |languages| counts, nothing
  * else). No stage collects document rows.
  */
object CurationStages {

  /** Ops and their accepted parameter keys — parse-time validation
    * surface (JobConfig rejects unknown ops/params before cluster work).
    */
  val Ops: Map[String, Set[String]] = Map(
    "exact_dedup" -> Set.empty,
    "near_dedup" -> Set("threshold"),
    "decontaminate" -> Set("holdoutSource", "minShared"),
    "pii_scrub" -> Set.empty,
    "quality_filter" -> Set("minScore"),
    "stratified_sample" -> Set("rates", "default"),
    "temperature_mix" -> Set("alpha", "budgetDocs"),
    "pack" -> Set("tokenBudget"))

  def apply(docs: DataFrame, stage: StageSpec): DataFrame = stage.op match {

    // q20 semantics: one canonical (minimum) doc_id per exact text
    case "exact_dedup" =>
      val keep = docs
        .groupBy(md5(col("text").cast("binary")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      docs.join(keep, Seq("doc_id"), "left_semi")

    // q21 pairs thresholded, q62's components, q63's canonicalize — the
    // corpus never shuffles on cluster keys (anti-join against the drop
    // set, see DedupOps.q63CanonicalCorpus)
    case "near_dedup" =>
      val threshold = stage.dbl("threshold", 0.5)
      val pairs = graft.queries.TextOps.ngramJaccardPairs(docs)
        .filter(col("jaccard") >= threshold)
        .select("a", "b")
      graft.operators.Components.canonicalize(docs, pairs)

    // q51 shape: drop the held-out source itself AND every training
    // document sharing >= minShared distinct 4-grams with it
    case "decontaminate" =>
      val holdout = stage.str("holdoutSource")
      val minShared = stage.int("minShared", 2)
      val contaminated = graft.queries.PipelineOps
        .contaminationOverlap(docs, holdout)
        .filter(col("shared") >= minShared)
        .select(col("train_id").as("doc_id"))
        .distinct()
      docs.filter(col("source") =!= holdout)
        .join(contaminated, Seq("doc_id"), "left_anti")

    // q55's fused rule table over the text column (map-only)
    case "pii_scrub" =>
      docs.withColumn("text",
        org.apache.spark.sql.graft.RegexScrub
          .regex_scrub(col("text"), graft.queries.CurationOps.PiiRules)("scrubbed"))

    // q56's published linear model; keeps rows whose logit clears the bar
    case "quality_filter" =>
      val minScore = stage.dbl("minScore", 0.0)
      val (_, _, _, score) = graft.queries.CurationOps.qualityColumns(col("t"))
      docs
        .withColumn("t", graft.functions.TextFunctions.tokens("text"))
        .filter(size(col("t")) > 0 && score > minScore)
        .drop("t")

    // q49's consistent-hash gate with a declared per-language rate table
    case "stratified_sample" =>
      val default = stage.int("default", 80)
      val rates = stage.ratesMap
      docs.filter(hashBucket < rateFor(rates, default))

    // q57's share^alpha mixing weights, applied as per-language keep
    // RATES through the same consistent hash — map-only (an exact
    // per-language top-N would serialize each language through one
    // window partition at 100 TB; rate gating keeps the scan parallel
    // and the expected kept count equal to the declared budget)
    case "temperature_mix" =>
      val alpha = stage.dbl("alpha", 0.5)
      val budget = stage.int("budgetDocs")
      // |languages| rows of driver state, like q57's centroid-free scalars
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wsum = counts.toSeq.sortBy(_._1).map { case (_, n) =>
        math.pow(n.toDouble, alpha) }.sum
      val keepPct = counts.map { case (l, n) =>
        val target = math.pow(n.toDouble, alpha) / wsum * budget
        l -> math.min(100L, math.round(target / n * 100))
      }
      docs.filter(hashBucket <
        keepPct.foldLeft(lit(0L): Column) { case (acc, (l, pct)) =>
          when(col("lang") === l, lit(pct)).otherwise(acc) })

    // q50's shard-keyed greedy packer
    case "pack" =>
      graft.queries.PipelineOps.packed(docs, stage.int("tokenBudget", 256))

    case other =>
      throw new IllegalArgumentException(s"unknown curation stage op '$other'")
  }

  /** q49's deterministic gate: the engine's rolling hash of the decimal
    * doc id, mod 100 — identical on re-runs and across engines.
    */
  private def hashBucket: Column =
    graft.functions.TextFunctions.fingerprint("CAST(doc_id AS STRING)") % 100

  private def rateFor(rates: Map[String, Long], default: Int): Column =
    rates.foldLeft(lit(default.toLong): Column) { case (acc, (l, pct)) =>
      when(col("lang") === l, lit(pct)).otherwise(acc)
    }

  /** Run the declared chain, optionally auditing row counts per stage
    * (one count action per stage — opt-in; at 100 TB each audit is a full
    * pass over that stage's output).
    */
  def run(docs: DataFrame, stages: Seq[StageSpec],
      audit: Option[(String, Long) => Unit] = None): DataFrame =
    stages.foldLeft(docs) { (df, st) =>
      val out = CurationStages(df, st)
      audit.foreach(f => f(st.op, out.count()))
      out
    }
}
