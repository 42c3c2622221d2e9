package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additional SQL-surface operators beyond the reference (free on Catalyst,
  * SURVEY §2.5/§2.6 "absent in reference; Spark built-ins cover them"):
  * intersect, pivot, exact percentiles. Each keeps the cross-engine
  * determinism rules of QueryDef.
  */
object SqlSurface {

  /** Q36 — INTERSECT set op: nations having both customers and suppliers
    * (complement of q9's EXCEPT). Integer-only.
    */
  val q36Intersect: QueryDef = QueryDef.sql(
    "q36_intersect",
    """SELECT n_nationkey FROM (
      |  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      |  INTERSECT
      |  SELECT DISTINCT s_nationkey AS n_nationkey FROM supplier) t
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir, "customer").select(col("c_nationkey").as("n_nationkey")).distinct()
    val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("n_nationkey")).distinct()
    c.intersect(sup).orderBy("n_nationkey")
  }

  /** Q37 — pivot: daily event counts spread across event-type columns.
    * Expressed as conditional aggregation in both engines (the portable
    * form of PIVOT; Spark's .pivot plans to exactly this Expand-free shape
    * when the key list is static). Counts only → exact.
    */
  val q37Pivot: QueryDef = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val duckCols = types.map(t =>
      s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS n_$t").mkString(",\n  ")
    QueryDef.sql(
      "q37_pivot",
      s"""SELECT CAST(ts AS DATE) AS day,
         |  $duckCols
         |FROM events
         |GROUP BY CAST(ts AS DATE)
         |ORDER BY day""".stripMargin) { (s, dir) =>
      val aggs = types.map(t =>
        sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t"))
      Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("day")
    }
  }

  /** Q38 — exact median (percentile 0.5): per returnflag over integer keys.
    * Both engines interpolate lower + (higher−lower)·0.5 over ints — the
    * halves are exactly representable doubles, so results are bit-identical.
    */
  val q38Median: QueryDef = QueryDef.sql(
    "q38_median",
    """SELECT l_returnflag,
      |  quantile_cont(l_partkey, 0.5) AS median_part,
      |  quantile_cont(l_suppkey, 0.5) AS median_supp,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_partkey, 0.5)").as("median_part"),
        expr("percentile(l_suppkey, 0.5)").as("median_supp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(q36Intersect, q37Pivot, q38Median)
}
