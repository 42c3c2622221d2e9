package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked projections of the ML dataflow surface (SURVEY §2.8): the
  * forward pass (`features`, M3) and metric aggregation (`test`, M4) of a
  * linear scorer with fixed deterministic weights. The per-sample score is
  * a sequential double fold — one correctly-rounded op per element in a
  * fixed order, so both engines produce bit-identical doubles (same
  * contract as VectorFunctions.DotSeqSql; the weight literals parse to the
  * same doubles from the same decimal strings). The trained variants
  * (M1/M2 — gradient descent via treeAggregate) live in graft.ml and are
  * covered by convergence tests instead (floating-point training is
  * inherently iteration-order sensitive, not oracle material).
  */
object MlOps {

  /** Fixed scorer weights, one decimal digit each. */
  private val weights: Seq[Double] =
    (0 until 64).map(i => ((i * 37) % 21 - 10) / 10.0)
  private val wSparkArr = weights.map(w => s"${w}D").mkString("array(", ", ", ")")
  private val wDuckArr = weights.map(w => s"CAST($w AS DOUBLE)").mkString("[", ", ", "]")
  private val ScoreDuck =
    s"list_dot_product(CAST(embedding AS DOUBLE[]), $wDuckArr)"
  private val scoreSpark =
    s"aggregate(zip_with(embedding, $wSparkArr, (x, y) -> CAST(x AS DOUBLE) * y), " +
      "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"

  /** Q29 — `features` forward pass (reference CaffeOnSpark.scala:427-438):
    * per-sample linear score ("ip1" blob) + sign prediction. Map-only, the
    * weight vector rides into the plan as a literal (broadcast-equivalent).
    */
  val q29Features: QueryDef = QueryDef.sql(
    "q29_features",
    s"""SELECT vec_id AS sample_id, label,
       |  $ScoreDuck AS ip1,
       |  $ScoreDuck > 0 AS pred
       |FROM embeddings
       |ORDER BY sample_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "embeddings")
      .select(col("vec_id").as("sample_id"), col("label"), expr(scoreSpark).as("ip1"))
      .withColumn("pred", col("ip1") > 0)
      .orderBy("sample_id")
  }

  /** Q30 — `test` metric aggregation (reference CaffeOnSpark.scala:396-418):
    * per-label accuracy of the q29 scorer against the deterministic target
    * y = (e[0] + e[1] > 0). Exact-int count ratio → bit-identical accuracy.
    */
  val q30TestMetrics: QueryDef = QueryDef.sql(
    "q30_test_metrics",
    s"""SELECT label, count(*) AS n,
       |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS accuracy
       |FROM (
       |  SELECT label, $ScoreDuck > 0 AS pred,
       |    CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) > 0 AS y
       |  FROM embeddings)
       |GROUP BY label
       |ORDER BY label""".stripMargin) { (s, dir) =>
    Tables(s, dir, "embeddings")
      .select(col("label"),
        expr(s"$scoreSpark > 0").as("pred"),
        expr("CAST(embedding[0] AS DOUBLE) + CAST(embedding[1] AS DOUBLE) > 0").as("y"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("y"), 1).otherwise(0)).as("n_correct"))
      .withColumn("accuracy", col("n_correct") / col("n"))
      .orderBy("label")
  }

  // ---- multi-output (softmax) surface: q87 / q88 ----------------------
  //
  // The reference's features/test emit one blob column PER net output
  // (CaffeOnSpark.scala:479); a k-class head's blobs are the k logits
  // and the k-way softmax. Same fixed-weights discipline as q29/q30 (the
  // TRAINED path is graft.ml.SoftmaxRegression, convergence-tested in
  // MlSpec — floating-point training is not oracle material): a 3×64
  // one-decimal-digit weight matrix, logits as the shared sequential
  // double fold (bit-identical cross-engine), argmax over exact doubles
  // with ties to the smaller class. Softmax goes through exp(), whose
  // last-ulp rounding is NOT pinned cross-engine — probabilities are
  // therefore nano-quantized (floor(p·1e9 + 0.5), the q65/q81 ln
  // discipline); MlSpec pins every value's distance from its flip
  // boundary.
  private val NumClasses = 3
  private val wMatrix: Seq[Seq[Double]] =
    (0 until NumClasses).map(c =>
      (0 until 64).map(i => (((i * 37 + c * 17) % 21) - 10) / 10.0))
  private def classScoreDuck(c: Int): String = {
    val arr = wMatrix(c).map(w => s"CAST($w AS DOUBLE)").mkString("[", ", ", "]")
    s"list_dot_product(CAST(embedding AS DOUBLE[]), $arr)"
  }
  private def classScoreSpark(c: Int): String = {
    val arr = wMatrix(c).map(w => s"${w}D").mkString("array(", ", ", ")")
    s"aggregate(zip_with(embedding, $arr, (x, y) -> CAST(x AS DOUBLE) * y), " +
      "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
  }
  /** argmax class over exact logits, ties to the smaller id — identical
    * double comparisons in both engines. `z` indexes 0-based names.
    */
  private def argmax3(z: Int => String): String =
    s"CASE WHEN ${z(0)} >= ${z(1)} AND ${z(0)} >= ${z(2)} THEN 0 " +
      s"WHEN ${z(1)} >= ${z(2)} THEN 1 ELSE 2 END"

  /** Q87 — multi-output `features` forward pass: per sample the k logits
    * (`z0..z2`, exact doubles), the argmax prediction, and the k-way
    * softmax nano-quantized (`p0_n9..p2_n9`). Map-only; the weight MATRIX
    * rides into the plan as k array literals (broadcast-equivalent), the
    * softmax is the numerically-stable exp(z−max) form in both engines.
    *
    * ORACLE SHAPE: the driver's correctness gate hashes results through
    * pandas, which cannot sort/hash array cells — so the oracle-facing
    * schema is one SCALAR column per (blob, class), the q26/q88
    * discipline. The k-blob ArrayType form the reference emits
    * (CaffeOnSpark.scala:479) lives on the `Graft.features` /
    * MlStreams API surface, where no pandas gate sits; QuerySpec's
    * registry guard asserts no oracle-checked query ever reintroduces a
    * complex-typed output column.
    */
  val q87SoftmaxFeatures: QueryDef = QueryDef.sql(
    "q87_softmax_features",
    s"""SELECT sample_id, label, z0, z1, z2,
       |  ${argmax3(i => s"z$i")} AS pred,
       |  CAST(floor(exp(z0 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p0_n9,
       |  CAST(floor(exp(z1 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p1_n9,
       |  CAST(floor(exp(z2 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p2_n9
       |FROM (
       |  SELECT sample_id, label, z0, z1, z2, m,
       |    exp(z0 - m) + exp(z1 - m) + exp(z2 - m) AS den
       |  FROM (
       |    SELECT vec_id AS sample_id, label,
       |      ${classScoreDuck(0)} AS z0, ${classScoreDuck(1)} AS z1,
       |      ${classScoreDuck(2)} AS z2,
       |      greatest(${classScoreDuck(0)}, ${classScoreDuck(1)},
       |        ${classScoreDuck(2)}) AS m
       |    FROM embeddings))
       |ORDER BY sample_id""".stripMargin) { (s, dir) =>
    val base = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("sample_id"), col("label"),
        expr(classScoreSpark(0)).as("z0"), expr(classScoreSpark(1)).as("z1"),
        expr(classScoreSpark(2)).as("z2"))
      .withColumn("m", greatest(col("z0"), col("z1"), col("z2")))
      .withColumn("den",
        exp(col("z0") - col("m")) + exp(col("z1") - col("m")) +
          exp(col("z2") - col("m")))
    def pn9(c: Int) =
      floor(exp(col(s"z$c") - col("m")) / col("den") * lit(1000000000L) + lit(0.5))
        .cast("long")
    base.select(col("sample_id"), col("label"),
      col("z0"), col("z1"), col("z2"),
      expr(argmax3(i => s"z$i")).as("pred"),
      pn9(0).as("p0_n9"), pn9(1).as("p1_n9"), pn9(2).as("p2_n9"))
      .orderBy("sample_id")
  }

  /** Q88 — multi-output `test` aggregation: per-label sample count,
    * argmax accuracy against the deterministic 3-class target
    * y = argmax(e[0], e[1], e[2]), and the per-class SUM of the quantized
    * softmax blob (exact long sums — the order-free form of the
    * reference's per-blob means; mean = sum / (n·1e9) downstream).
    */
  val q88SoftmaxTest: QueryDef = QueryDef.sql(
    "q88_softmax_test",
    s"""SELECT label, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS accuracy,
       |  CAST(sum(p0) AS BIGINT) AS sum_p0_n9,
       |  CAST(sum(p1) AS BIGINT) AS sum_p1_n9,
       |  CAST(sum(p2) AS BIGINT) AS sum_p2_n9
       |FROM (
       |  SELECT label, ${argmax3(i => s"z$i")} AS pred,
       |    ${argmax3(i => s"CAST(embedding[${i + 1}] AS DOUBLE)")} AS y,
       |    CAST(floor(exp(z0 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p0,
       |    CAST(floor(exp(z1 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p1,
       |    CAST(floor(exp(z2 - m) / den * 1000000000 + 0.5) AS BIGINT) AS p2
       |  FROM (
       |    SELECT label, embedding, z0, z1, z2, m,
       |      exp(z0 - m) + exp(z1 - m) + exp(z2 - m) AS den
       |    FROM (
       |      SELECT label, embedding,
       |        ${classScoreDuck(0)} AS z0, ${classScoreDuck(1)} AS z1,
       |        ${classScoreDuck(2)} AS z2,
       |        greatest(${classScoreDuck(0)}, ${classScoreDuck(1)},
       |          ${classScoreDuck(2)}) AS m
       |      FROM embeddings)))
       |GROUP BY label
       |ORDER BY label""".stripMargin) { (s, dir) =>
    val base = Tables(s, dir, "embeddings")
      .select(col("label"), col("embedding"),
        expr(classScoreSpark(0)).as("z0"), expr(classScoreSpark(1)).as("z1"),
        expr(classScoreSpark(2)).as("z2"))
      .withColumn("m", greatest(col("z0"), col("z1"), col("z2")))
      .withColumn("den",
        exp(col("z0") - col("m")) + exp(col("z1") - col("m")) +
          exp(col("z2") - col("m")))
    def pn9(c: Int) =
      floor(exp(col(s"z$c") - col("m")) / col("den") * lit(1000000000L) + lit(0.5))
        .cast("long")
    base
      .select(col("label"),
        expr(argmax3(i => s"z$i")).as("pred"),
        expr(argmax3(i =>
          s"CAST(embedding[$i] AS DOUBLE)")).as("y"),
        pn9(0).as("p0"), pn9(1).as("p1"), pn9(2).as("p2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("y"), 1).otherwise(0)).as("n_correct"),
        sum(col("p0")).as("sum_p0_n9"), sum(col("p1")).as("sum_p1_n9"),
        sum(col("p2")).as("sum_p2_n9"))
      .withColumn("accuracy", col("n_correct") / col("n"))
      .select("label", "n", "n_correct", "accuracy",
        "sum_p0_n9", "sum_p1_n9", "sum_p2_n9")
      .orderBy("label")
  }

  val all: Seq[QueryDef] =
    Seq(q29Features, q30TestMetrics, q87SoftmaxFeatures, q88SoftmaxTest)

  /** Test access for MlSpec's boundary-distance pin (the p*_n9
    * quantization's safety margin is an asserted property, not luck).
    */
  private[graft] def softmaxWeights: Seq[Seq[Double]] = wMatrix
}
