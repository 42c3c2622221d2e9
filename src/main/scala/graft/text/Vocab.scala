package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary build / persist / load (reference tools/Vocab.scala:28-59 —
  * SURVEY T2/S8/K4): tokenize → count → rank by frequency → cutoff →
  * prepend UNK → index = position.
  *
  * Spark-native shape: the count is a hash aggregate with partials; the
  * rank uses a single global window over the top-k survivors only (k rows,
  * not the corpus), so the full word table never sorts globally.
  */
object Vocab {
  val UNK = "UNK"
  /** id 0 is the START/END marker (never a word); UNK takes id 1 —
    * reference Vocab.scala:12-18 / Conversions START/UNK convention. */
  val UNK_ID = 1

  /** Build a vocab DataFrame (word, id) from a text column: UNK at id 1,
    * then words ranked by (count desc, word asc) from id 2 — deterministic.
    */
  def build(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(vocabSize - 2) // ids 0 (START) and 1 (UNK) are reserved
    val w = Window.orderBy(col("n").desc, col("word"))
    val ranked = counted.withColumn("id", row_number().over(w) + 1)
      .select(col("word"), col("id"))
    Seq((UNK, UNK_ID)).toDF("word", "id").unionByName(ranked)
  }

  /** K4 writer: one word per line, line number = id (coalesce(1) like the
    * reference's `coalesce(1,true).saveAsTextFile`).
    */
  def save(vocab: DataFrame, path: String): Unit =
    vocab.orderBy("id").select("word").coalesce(1).write.mode("overwrite").text(path)

  /** S8 loader: text file → (word, id) by line position. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val w = Window.orderBy(monotonically_increasing_id())
    spark.read.text(path)
      .select(col("value").as("word"))
      .coalesce(1)
      .withColumn("id", row_number().over(w))
  }

  /** Broadcastable word→id map (driver holds O(vocab), not O(corpus)).
    * The O(k) contract is enforced, not assumed: a vocab DataFrame that is
    * secretly corpus-sized (a missed top-k upstream) fails loudly here
    * instead of OOMing the driver mid-collect.
    */
  def toMap(vocab: DataFrame, maxVocab: Int = 1 << 22): Map[String, Int] = {
    // One action, not count()+collect() (which recomputes the full corpus
    // aggregation lineage twice): take(cap+1) both fetches the rows and
    // proves the cap — the +1th row's existence is the violation signal,
    // without ever materializing more than cap+1 rows on the driver.
    val rows = vocab.take(maxVocab + 1)
    require(rows.length <= maxVocab,
      s"Vocab.toMap collects the vocab to the driver: got > cap $maxVocab rows")
    rows.map(r => r.getString(0) -> r.getInt(1)).toMap
  }
}
