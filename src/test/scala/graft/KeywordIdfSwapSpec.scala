package graft

import org.apache.spark.sql.functions._

/** The q102 scaladoc claims a production build "swaps in log-idf without
  * touching the plan shape" — this spec makes the claim a check (r17
  * ADVICE-list task): the tf·ln(N/df) variant must produce the IDENTICAL
  * physical plan-node sequence (only the score expression differs), and
  * on every document where the two scorers agree on the ranking, the
  * extracted keywords must be identical. The linear integer form stays
  * the registered default because its cross-engine compare is exact;
  * the swap being plan-free is what makes that a quantization choice,
  * not an architecture commitment.
  */
class KeywordIdfSwapSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  private def nodeSeq(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => nodeSeq(a.executedPlan)
    case q: QueryStageExec => nodeSeq(q.plan)
    case other => other.getClass.getSimpleName +: other.children.flatMap(nodeSeq)
  }

  private def variant(logIdf: Boolean) = {
    val docs = Tables(spark, sf, "documents")
    queries.TextOps.keywordRankedLayout(docs,
      sources.TermStats(spark, sf),
      sources.CorpusStats.rowCount(spark, sf, "documents"),
      topK = 3, logIdf = logIdf)
  }

  test("log-idf swaps in with an identical physical plan-node sequence") {
    val lin = variant(logIdf = false)
    val log = variant(logIdf = true)
    lin.collect(); log.collect() // settle AQE so executed plans are final
    assert(nodeSeq(lin.queryExecution.executedPlan)
        == nodeSeq(log.queryExecution.executedPlan),
      "the idf swap changed the plan tree — the scaladoc claim is false")
  }

  test("where the two scorers rank a doc identically, the keywords are identical") {
    def kws(logIdf: Boolean): Map[Long, Seq[String]] =
      variant(logIdf)
        .groupBy("doc_id")
        .agg(expr("transform(array_sort(collect_list(struct(rank, w))), x -> x.w)")
          .as("kw"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val lin = kws(logIdf = false)
    val log = kws(logIdf = true)
    assert(lin.keySet == log.keySet, "the swap changed which docs have keywords")
    // both scores are tf-increasing and df-decreasing, so rankings agree
    // except where the tf-vs-idf TRADEOFF genuinely differs (tf·linear
    // and tf·ln weight the axes differently — a real semantic choice,
    // not noise); the claim under test is that the swap is plan-free and
    // agreement-exact, not that the two scorers are the same scorer
    val agree = lin.keys.count(k => lin(k) == log(k))
    assert(agree > lin.size / 2,
      s"scorers agree on only $agree/${lin.size} docs — swap looks broken")
  }
}
