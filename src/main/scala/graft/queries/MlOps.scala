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

  val all: Seq[QueryDef] = Seq(q29Features, q30TestMetrics)
}
