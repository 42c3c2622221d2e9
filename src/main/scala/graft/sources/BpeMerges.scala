package graft.sources

import org.apache.spark.sql.SparkSession

/** The learned BPE merge table (r, left_sym, right_sym, merged, cnt)
  * persisted once per source corpus — the trainer→tokenizer artifact
  * every LLM pipeline ships: q82 IS the training run (its first execution
  * builds the artifact; re-runs read it), and q84's application pass
  * loads the table instead of re-learning it per run. The `bpe_annotate`
  * curation stage keeps learning from its FLOWING frame by default (a
  * shipped tokenizer is induced on the curated corpus) but can declare
  * `mergesFrom: "corpus"` to apply this artifact train-once style.
  *
  * The stored rows are EXACTLY [[graft.queries.TextOps.learnBpeMerges]]'s
  * output (integer counts + ASCII symbols — parquet round-trips them
  * bit-for-bit), so q82/q84's oracle comparisons are unchanged.
  * Stamping/atomicity/reaping are [[DerivedLayout]]'s, keyed on
  * documents.parquet. K rows total — driver-scale at any corpus size
  * (the merge table is the tokenizer's whole state).
  */
object BpeMerges {

  /** Bump when the trainer changes behavior (round count, pairing rule,
    * token grammar).
    */
  private val Version = "v1"

  type Table = Seq[(Long, String, String, String, Long)]

  // collected-table memo, IvfCentroids' discipline: (session, stamped
  // path) keys make staleness impossible
  private val cache = SessionMemo.track(
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Table])(_._1)

  def layoutPath(dir: String): String =
    DerivedLayout.layoutPath("bpe", Version, dir, Seq(s"$dir/documents.parquet"))

  /** The merge table in round order, building (training) it first if
    * absent.
    */
  def apply(spark: SparkSession, dir: String): Table = {
    val target = layoutPath(dir)
    SessionMemo.cachedStamped(cache, spark, target)({
      val df = DerivedLayout(spark, target) { tmp =>
        spark.createDataFrame(graft.queries.TextOps.learnBpeMerges(spark, dir))
          .toDF("r", "left_sym", "right_sym", "merged", "cnt")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      }
      df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
    })
  }
}
