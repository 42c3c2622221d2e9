package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Caption ↔ id-sequence codec (reference tools/Conversions.scala:146-229 —
  * SURVEY T3/T4): sentence to fixed-length int arrays with START/UNK ids and
  * −1 padding, and the reverse mapping.
  *
  * The reference iterates rows with a driver-held map; here the vocab rides
  * as a broadcast map inside column expressions (map literal → `element_at`),
  * so encode/decode are map-only and codegen-friendly at any corpus size.
  */
object CaptionCodec {
  val START_ID = 0 // reference uses id 0 as START/END marker (Vocab.scala:12-18)
  val PAD = -1

  /** Column literal map from a vocab map (word→id). */
  private def vocabLit(vocab: Map[String, Int]): Column =
    map(vocab.toSeq.sortBy(_._1).flatMap { case (w, i) => Seq(lit(w), lit(i)) }: _*)

  private def idsLit(vocab: Map[String, Int]): Column =
    map(vocab.toSeq.sortBy(_._1).flatMap { case (w, i) => Seq(lit(i), lit(w)) }: _*)

  /** T3 encode: caption → (input, cont, target) arrays of length `len`.
    *   input  = START :: ids, padded;  target = ids :: padded;
    *   cont   = 0 at START, 1 over real tokens, 0 in padding
    * (mirrors Conversions.scala:163-182 semantics).
    */
  def encode(df: DataFrame, textCol: String, vocab: Map[String, Int], len: Int): DataFrame = {
    val unk = Vocab.UNK_ID
    val ids = expr(
      s"transform(${graft.functions.TextFunctions.tokensSparkSql(textCol)}, " +
        s"w -> coalesce(element_at(__vocab, w), $unk))")
    df.withColumn("__vocab", vocabLit(vocab))
      .withColumn("__ids", ids)
      .withColumn("input_sentence",
        expr(s"transform(sequence(1, $len), i -> " +
          s"CASE WHEN i = 1 THEN $START_ID WHEN i - 1 <= size(__ids) THEN __ids[i - 2] ELSE $PAD END)"))
      .withColumn("cont_sentence",
        expr(s"transform(sequence(1, $len), i -> " +
          s"CASE WHEN i = 1 THEN 0 WHEN i - 1 <= size(__ids) THEN 1 ELSE 0 END)"))
      .withColumn("target_sentence",
        expr(s"transform(sequence(1, $len), i -> " +
          s"CASE WHEN i <= size(__ids) THEN __ids[i - 1] ELSE $PAD END)"))
      .drop("__vocab", "__ids")
  }

  /** T4 decode: id array → words, skipping START and padding. */
  def decode(df: DataFrame, idsCol: String, outCol: String, vocab: Map[String, Int]): DataFrame =
    df.withColumn("__ids2", idsLit(vocab))
      .withColumn(outCol,
        expr(s"array_join(transform(filter($idsCol, i -> i > 0), " +
          s"i -> element_at(__ids2, i)), ' ')"))
      .drop("__ids2")
}
