package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table. The reference has no
  * streaming surface (SURVEY §2.10) — these are the rebuild's extension
  * capabilities: event-time windowing, gap sessionization, as-of join and
  * semi-structured JSON extraction, written as batch plans whose streaming
  * twins (Structured Streaming with watermarks) live in graft.streaming.
  */
object EventOps {

  // exact integer-cents money sums (see queries.Relational header): the
  // value column is a 2-decimal double; floor(v*100 + 0.5) recovers exact
  // cents in pure double/long codegen (values land within 1e-9 of the cent
  // integer, never on a tie), the sum accumulates in the native 128-bit
  // Sum128 aggregate (overflow-safe, no per-row Decimal allocation), and
  // the oracle routes the sum through VARCHAR (DuckDB HUGEINT→DOUBLE
  // double-rounds above 2^53)
  private def centsSum(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.SumExpressions.sum128(floor(c * 100 + lit(0.5)))
      .cast(DoubleType) / 100.0
  private def SumVal(x: String) =
    s"(CAST(CAST(sum(CAST(round($x * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100.0)"

  /** Q22 — event-time tumbling window aggregation (hourly): the batch twin of
    * `groupBy(window($"ts","1 hour"))`. Shuffle key (hour, type) is tight;
    * partial aggregation makes the shuffle O(|buckets|).
    */
  val q22EventsHourly: QueryDef = QueryDef.sql(
    "q22_events_hourly",
    s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
       |  count(*) AS n, ${SumVal("value")} AS sum_value
       |FROM events
       |GROUP BY date_trunc('hour', ts), event_type
       |ORDER BY bucket, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("sum_value"))
      .orderBy("bucket", "event_type")
  }

  /** Q23 — gap-based sessionization (30-min inactivity): lag→flag→cumsum→
    * aggregate, the portable formulation of `session_window`. One shuffle on
    * user_id; timestamps compare in exact microseconds in both engines.
    */
  /** The q23 oracle's per-event session assignment (flagged → sessions
    * CTEs, event_type carried), shared verbatim with q80's path analysis
    * so the two session definitions can never drift.
    */
  private[graft] val SessionCtesSql: String =
    """flagged AS (
      |  SELECT user_id, event_id, ts, value, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, event_id, ts, value, event_type,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged)""".stripMargin

  /** q23's per-event session assignment (user_id, event_id, ts, value,
    * event_type, session_idx) — the ONE sessionization implementation,
    * shared by q23's aggregate and q80's transition matrix.
    */
  private[graft] def sessionizedEvents(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("event_type"))
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(wRun))
      .drop("new_session")
  }

  val q23Sessionize: QueryDef = QueryDef.sql(
    "q23_sessionize",
    s"""WITH $SessionCtesSql
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  min(ts) AS session_start, max(ts) AS session_end, ${SumVal("value")} AS sum_value
       |FROM sessions
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin) { (s, dir) =>
    sessionizedEvents(Tables(s, dir, "events"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        centsSum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Q24 — as-of join: latest order at-or-before each event's timestamp for
    * the event's user (composition path (a) from the custom-operator
    * preference order: equi-join on the key + time filter + per-event top-1).
    * Scale notes: the join key (user) bounds fan-out to orders-per-user; a
    * sort-merge AsOfJoinExec is the dedicated-operator upgrade if fan-out
    * grows. Inner semantics: events with no prior order drop out.
    */
  val q24AsofJoin: QueryDef = QueryDef.sql(
    "q24_asof_join",
    """SELECT event_id, user_id, ts, o_orderkey, o_orderdate
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events").select("event_id", "user_id", "ts")
    val o = Tables(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    // Runs on the engine's native AsOfJoinExec (org.apache.spark.sql.graft):
    // co-partition by key, sort (key, time), ONE merge pass with O(1) state —
    // no |events|×|orders-per-user| fan-out, no second shuffle, unlike the
    // compose formulation (join + top-1 aggregate) it replaces. Tie-break on
    // o_orderkey matches the oracle's (date DESC, key DESC) top-1.
    org.apache.spark.sql.graft.AsOf.join(
        e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        rightTieBreak = Seq("o_orderkey"))
      .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  /** Q25 — semi-structured extraction: JSON path into typed column, then
    * aggregate. The extraction is the native [[org.apache.spark.sql.graft.JsonLongField]]
    * (one codegen'd byte scan per row) — the built-in get_json_object is a
    * CodegenFallback Jackson parse that cost ~50× the oracle's vectorized
    * extract and broke the stage around it. Shuffle only carries the 5
    * event_type groups.
    */
  val q25JsonExtract: QueryDef = QueryDef.sql(
    "q25_json_extract",
    """SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_type"),
        org.apache.spark.sql.graft.JsonExpressions.json_long_field(col("props"), "k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Q41 — sliding event-time windows (1 h window, 15 min slide): each event
    * lands in 4 overlapping buckets, generated by exact integer epoch
    * arithmetic (the batch twin of `window(ts, "1 hour", "15 minutes")`).
    * Explode-then-aggregate: shuffle carries (bucket, type) partials only.
    */
  val q41SlidingWindow: QueryDef = QueryDef.sql(
    "q41_sliding_window",
    s"""SELECT make_timestamp(CAST((epoch_us(ts) // 900000000 - k) * 900000000 AS BIGINT)) AS win_start,
       |  event_type, count(*) AS n, ${SumVal("value")} AS sum_value
       |FROM events, unnest([0, 1, 2, 3]) AS t(k)
       |GROUP BY 1, 2
       |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .withColumn("win_start",
        timestamp_micros(expr("(unix_micros(ts) div 900000000 - k) * 900000000")))
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Q75 — ordered-step funnel (signup → click → purchase, each step within
    * 24 h of the previous): for each user, the first signup, the first
    * click strictly after it within the window, and the first purchase
    * strictly after that within its window; the report is step user-counts
    * plus conversion ratios. The product-analytics staple
    * (Amplitude/Mixpanel's core query) the reference's dataflow never had.
    * On sf0.01 the steps are 150 → 65 → 29 — the windows are what make the
    * funnel discriminative on this corpus.
    *
    * Plan shape: ONE exchange on user_id feeds the whole query — the three
    * chained whole-partition `min(when)` windows share the same partitioning
    * and sort, the per-user collapse reuses it (no second exchange), and the
    * final report is a 1-row global aggregate of 0/1 longs. Events per user
    * bound window memory; at 100 TB the plan is a single user-keyed pass.
    *
    * Determinism: timestamps compare in exact microseconds; counts are
    * longs; the conversion ratios are one long-derived double division in
    * identical association order (guarded against 0 denominators).
    */
  /** q75's per-user stage frame (user_id, t1, t2, t3): the funnel chain
    * before the 1-row report collapse. Shared with the streaming twin's
    * equality spec ([[graft.streaming.EventStreams.funnelStages]] must
    * converge to exactly this frame).
    */
  private[graft] def funnelStages(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"), col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
  }

  /** The q75 oracle's per-user funnel CTE chain (s1/s2/s3 chained windows
    * → u per-user stage timestamps), shared verbatim with q78's latency
    * percentiles so the two oracles can never drift apart.
    */
  private[graft] val FunnelUserCtesSql: String =
    """s1 AS (
      |  SELECT user_id, event_type, ts,
      |    min(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1
      |  FROM events),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
      |                      AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
      |                      AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM s2),
      |u AS (
      |  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      |  FROM s3 GROUP BY user_id)""".stripMargin

  val q75Funnel: QueryDef = QueryDef.sql(
    "q75_funnel",
    s"""WITH $FunnelUserCtesSql,
      |c AS (
      |  SELECT
      |    CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS users_signup,
      |    CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS users_click,
      |    CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS users_purchase
      |  FROM u)
      |SELECT users_signup, users_click, users_purchase,
      |  CASE WHEN users_signup > 0
      |       THEN CAST(users_click AS DOUBLE) / users_signup END AS conv_click,
      |  CASE WHEN users_click > 0
      |       THEN CAST(users_purchase AS DOUBLE) / users_click END AS conv_purchase
      |FROM c""".stripMargin) { (s, dir) =>
    funnelStages(Tables(s, dir, "events"))
      .agg(
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("users_signup"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("users_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("users_purchase"))
      .select(col("users_signup"), col("users_click"), col("users_purchase"),
        when(col("users_signup") > 0,
          col("users_click").cast(DoubleType) / col("users_signup")).as("conv_click"),
        when(col("users_click") > 0,
          col("users_purchase").cast(DoubleType) / col("users_click")).as("conv_purchase"))
  }

  /** Q76 — cohort retention: users cohorted by their first-seen epoch day,
    * distinct-active counts at day offsets 0..7. The second product-
    * analytics staple next to q75's funnel.
    *
    * Day buckets are exact integer epoch-microsecond division (q41's
    * discipline — no DATE types anywhere, the cross-engine type rule), so
    * every grouping key and count is a long. Plan shape: the cohort
    * dimension is a user-keyed aggregate, the join back is co-partitioned
    * on the same key (one exchange feeds both), the distinct collapses
    * (user, cohort, offset) triples — O(active-user-days) — and the final
    * (cohort, offset) aggregate is at most 8× days-in-corpus rows.
    */
  val q76Retention: QueryDef = QueryDef.sql(
    "q76_retention",
    """WITH d AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT d.user_id, f.cohort_day, d.day - f.cohort_day AS day_offset
      |  FROM d JOIN f USING (user_id)
      |  WHERE d.day - f.cohort_day BETWEEN 0 AND 7)
      |SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS users
      |FROM a GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
    // FLOOR division, not `div` (truncation toward zero): the oracle's
    // `//` floors, and the two diverge by one on pre-1970 (negative-epoch)
    // timestamps. (a − pmod(a,b)) div b is floorDiv in exact long math —
    // a double floor(a/86400e6) can flip on exact-multiple boundaries.
    val d = Tables(s, dir, "events")
      .select(col("user_id"), expr(
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
        .as("day"))
    val f = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    d.join(f, "user_id")
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset").between(0, 7))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Q78 — funnel step-latency percentiles: p25/p50/p75 of
    * signup→click and click→purchase conversion time over q75's per-user
    * stage frame (shared CTEs/core — the two operators cannot drift).
    * The "how fast do converters convert" dashboard next to q75's "how
    * many convert".
    *
    * Determinism: latencies are exact µs longs (timestamp subtraction);
    * percentiles run on the native PercentileLong aggregate at dyadic
    * percentages only (q59's rule — the R-7 interpolation is then exact
    * in both engines). Plan shape: q75's single user-keyed exchange, then
    * two O(users) aggregates to 1-row frames.
    */
  val q78FunnelLatency: QueryDef = QueryDef.sql(
    "q78_funnel_latency",
    s"""WITH $FunnelUserCtesSql,
      |l1 AS (
      |  SELECT 'signup_to_click' AS step, count(*) AS n_users,
      |    quantile_cont(epoch_us(t2) - epoch_us(t1), 0.25) AS p25_us,
      |    quantile_cont(epoch_us(t2) - epoch_us(t1), 0.5) AS p50_us,
      |    quantile_cont(epoch_us(t2) - epoch_us(t1), 0.75) AS p75_us
      |  FROM u WHERE t2 IS NOT NULL),
      |l2 AS (
      |  SELECT 'click_to_purchase' AS step, count(*) AS n_users,
      |    quantile_cont(epoch_us(t3) - epoch_us(t2), 0.25) AS p25_us,
      |    quantile_cont(epoch_us(t3) - epoch_us(t2), 0.5) AS p50_us,
      |    quantile_cont(epoch_us(t3) - epoch_us(t2), 0.75) AS p75_us
      |  FROM u WHERE t3 IS NOT NULL)
      |SELECT step, CAST(n_users AS BIGINT) AS n_users, p25_us, p50_us, p75_us
      |FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
      |ORDER BY step""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graft.PercentileLong.percentile_long
    val st = funnelStages(Tables(s, dir, "events"))
    def step(name: String, from: String, to: String) =
      st.filter(col(to).isNotNull)
        .select((expr(s"unix_micros($to)") - expr(s"unix_micros($from)")).as("d_us"))
        .agg(count(lit(1)).as("n_users"),
          percentile_long(col("d_us"), 0.25).as("p25_us"),
          percentile_long(col("d_us"), 0.5).as("p50_us"),
          percentile_long(col("d_us"), 0.75).as("p75_us"))
        .select(lit(name).as("step"), col("n_users"), col("p25_us"),
          col("p50_us"), col("p75_us"))
    step("signup_to_click", "t1", "t2")
      .unionByName(step("click_to_purchase", "t2", "t3"))
      .orderBy("step")
  }

  /** Q80 — session path analysis: the event-type transition matrix over
    * q23's sessions (the "behavior flow" report — which step follows
    * which, inside a session). Transitions are consecutive-event pairs
    * WITHIN a session (the lead window resets at session boundaries by
    * partitioning on (user, session)); the output is the full
    * from×to count matrix plus each from-type's outgoing total, so
    * p(next | current) is one division away.
    *
    * Plan shape: the sessionize exchange on user_id ALSO satisfies the
    * (user, session) transition window — hashpartitioning(user_id) is a
    * coarser clustering of both keys — so one exchange feeds both window
    * passes; the matrix aggregate shuffles ≤ |types|² partial rows.
    *
    * Determinism: counts are longs; share = n / from_total is one
    * long-derived double division, identical cross-engine.
    */
  val q80EventFlow: QueryDef = QueryDef.sql(
    "q80_event_flow",
    s"""WITH $SessionCtesSql,
       |seq AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id, session_idx
       |                           ORDER BY ts, event_id) AS to_type
       |  FROM sessions),
       |m AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM seq WHERE to_type IS NOT NULL
       |  GROUP BY from_type, to_type)
       |SELECT from_type, to_type, n,
       |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS share
       |FROM m
       |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    val wNext = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    val m = sessionizedEvents(Tables(s, dir, "events"))
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(wNext).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("share", col("n").cast(DoubleType) /
        sum(col("n")).over(Window.partitionBy(col("from_type"))).cast(DoubleType))
      .orderBy("from_type", "to_type")
  }

  val all: Seq[QueryDef] = Seq(
    q22EventsHourly, q23Sessionize, q24AsofJoin, q25JsonExtract, q41SlidingWindow,
    q75Funnel, q76Retention, q78FunnelLatency, q80EventFlow)
}
