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
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t").mkString(",\n  ")
    // `day` is emitted as midnight TIMESTAMP, not DATE: Spark DATE parquet
    // loads into pandas as object(datetime.date) while DuckDB DATE becomes
    // datetime64 — the driver's dtype-sensitive hash would mismatch.
    // Timestamp outputs are proven hash-stable (q22/q23).
    QueryDef.sql(
      "q37_pivot",
      s"""SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         |  $duckCols
         |FROM events
         |GROUP BY 1
         |ORDER BY day""".stripMargin) { (s, dir) =>
      val aggs = types.map(t =>
        sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t"))
      Tables(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
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
    // native PercentileLong: bit-identical to the built-in percentile()
    // (PercentileSpec) with a primitive long->count map instead of the
    // boxed OpenHashMap the built-in fills per row
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        org.apache.spark.sql.graft.PercentileLong
          .percentile_long(col("l_partkey"), 0.5).as("median_part"),
        org.apache.spark.sql.graft.PercentileLong
          .percentile_long(col("l_suppkey"), 0.5).as("median_supp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Q43 — analytic window breadth: lag/lead/first/last over each
    * customer's order timeline. Raw value passthrough → exact; total order
    * (custkey, date, key) fixes frame contents in both engines.
    */
  val q43LagLead: QueryDef = QueryDef.sql(
    "q43_lag_lead",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_orderdate) OVER w AS prev_date,
      |  lead(o_orderdate) OVER w AS next_date,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Long.MinValue, Long.MaxValue)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderdate"), 1).over(w).as("prev_date"),
        lead(col("o_orderdate"), 1).over(w).as("next_date"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Q44 — string function breadth: LIKE filter, substring, concat, case
    * transforms, replace, lpad. Pure string passthrough → exact.
    */
  val q44Strings: QueryDef = QueryDef.sql(
    "q44_strings",
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 8)) AS head,
      |  replace(p_type, ' ', '_') AS type_slug,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  p_brand || ':' || p_type AS brand_type,
      |  length(p_name) AS name_len
      |FROM part
      |WHERE p_name LIKE '%a%' AND p_size >= 10
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .filter(col("p_name").like("%a%") && col("p_size") >= 10)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("head"),
        regexp_replace(col("p_type"), " ", "_").as("type_slug"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"))
      .orderBy("p_partkey")
  }

  /** Q45 — correlated scalar subquery (Catalyst decorrelates it to a join +
    * aggregate — SURVEY §4 "subquery decorrelation built-in"): customers
    * richer than their nation's average balance. The average divides an
    * exact integer-cents sum (< 2^53, so its double is exact) by the
    * count, identically in both engines.
    */
  val q45CorrelatedSubquery: QueryDef = QueryDef.sql(
    "q45_correlated_subquery",
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT (CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0) / count(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir, "customer")
    // expressed through the SQL correlation so Catalyst's decorrelation
    // rule (RewriteCorrelatedScalarSubquery) plans it — the point of the
    // operator — rather than hand-writing the join.
    c.createOrReplaceTempView("graft_q45_customer")
    s.sql(
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM graft_q45_customer c
        |WHERE c_acctbal > (
        |  SELECT (CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0) / count(*)
        |  FROM graft_q45_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(
    q36Intersect, q37Pivot, q38Median, q43LagLead, q44Strings, q45CorrelatedSubquery)
}
