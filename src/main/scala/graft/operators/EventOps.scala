package graft.operators

import graft.{Cols, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics over `events`: window functions (rank,
  * running total, lag), event-time bucketing (`window()` / date_trunc),
  * sessionization (gap-based), and JSON extraction. The streaming
  * (Structured Streaming) equivalents live in [[graft.streaming.StreamOps]];
  * these batch forms are the oracle-checkable surface.
  *
  * All window specs order by (ts, event_id) so ties are deterministic, and
  * money-ish double sums go through the exact-cents pattern ([[graft.Cols]]).
  */
object EventOps {
  import Cols._

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Epoch microseconds of the (NTZ) event timestamp; session TZ is UTC so
    * the cast is wall-clock-preserving, matching DuckDB's `epoch_us`. */
  private val tsUs = unix_micros(col("ts").cast("timestamp"))

  /** DuckDB CTE chain for the strict-order conversion funnel ending at
    * the per-user stage frame `f` (t1/t2/t3) — shared by
    * `q_funnel_stages` and `q_funnel_latency` so the two mirrors cannot
    * diverge (the sqlPowerCtes discipline). */
  private def sqlFunnelCtes: String =
    """e AS (SELECT user_id, event_type,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |a AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
      |        OVER (PARTITION BY user_id) AS t1 FROM e),
      |b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1
      |          THEN us END)
      |        OVER (PARTITION BY user_id) AS t2 FROM a),
      |c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2
      |          THEN us END)
      |        OVER (PARTITION BY user_id) AS t3 FROM b),
      |f AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |      FROM c GROUP BY user_id)""".stripMargin

  /** One row per (user, gap-delimited session): (user_id, session_no,
    * s_start, s_end, n_events). The batch ground truth for
    * [[graft.streaming.StreamOps.completedSessions]] — both window specs
    * and the final aggregate share the user_id partitioning, so the plan
    * carries ONE exchange. Requires a `(user_id, event_id, ts)` frame. */
  def sessionSpans(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("prev_us", lag(tsUs, 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || (tsUs - col("prev_us")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .groupBy("user_id", "session_no")
      .agg(min(col("ts")).cast("timestamp_ntz").as("s_start"),
        max(col("ts")).cast("timestamp_ntz").as("s_end"),
        count(lit(1)).as("n_events"))
  }

  val queries: Seq[Q] = Seq(

    // ---- ranking window ----
    Q("q_window_rank", Some(
      """SELECT user_id, event_id, value, CAST(rnk AS INTEGER) AS rnk FROM (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("user_id", "event_id", "value", "rnk")
        .orderBy("user_id", "rnk")
    },

    // ---- running (frame) aggregate ----
    Q("q_window_running", Some(
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)/100.0
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("running_value", sum(cents(col("value"))).over(w) / lit(100.0))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    },

    // ---- lag / event-time deltas ----
    Q("q_lag_gap", Some(
      """SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, dir)
        .withColumn("gap_us", tsUs - lag(tsUs, 1).over(w))
        .select("user_id", "event_id", "gap_us")
        .orderBy("user_id", "event_id")
    },

    // ---- event-time daily rollup ----
    Q("q_date_agg", Some(
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         |  COUNT(*) AS n, ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY day, event_type
         |ORDER BY day, event_type""".stripMargin)) { (s, dir) =>
      ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .orderBy("day", "event_type")
    },

    // ---- tumbling event-time window (batch form of the streaming agg) ----
    Q("q_hour_window", Some(
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         |  COUNT(*) AS n, ${sqlMoneySum("value")} AS sum_value
         |FROM events GROUP BY hour ORDER BY hour""".stripMargin)) { (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(col("w.start").cast("timestamp_ntz").as("hour"),
          col("n"), col("sum_value"))
        .orderBy("hour")
    },

    // ---- sliding windows (batch twin of StreamOps.slidingCounts) ----
    // 1-hour windows every 30 minutes: each event belongs to exactly
    // size/slide = 2 epoch-aligned windows. The oracle replicates
    // Spark's alignment arithmetic directly (starts at
    // floor(t/slide)*slide - k*slide), and window starts are emitted as
    // epoch SECONDS (BIGINT) so no tz-aware timestamp can drift between
    // engines. Scale: one map-side 2x expand + a keyed aggregate.
    Q("q_sliding_window", Some(
      s"""SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 1800
         |         - k.k) * 1800 AS w_start_s,
         |  COUNT(*) AS n, ${sqlMoneySum("value")} AS sum_value
         |FROM events, (SELECT UNNEST([0, 1]) AS k) k
         |GROUP BY w_start_s ORDER BY w_start_s""".stripMargin)) { (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts").cast("timestamp"), "1 hour",
          "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), moneySum(col("value"))
          .as("sum_value"))
        .select(expr("unix_micros(w.start) div 1000000").as("w_start_s"),
          col("n"), col("sum_value"))
        .orderBy("w_start_s")
    },

    // ---- gap-based sessionization (batch; streaming twin in StreamOps) ----
    Q("q_sessionize", Some(
      """SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions,
        |       COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM (
        |    SELECT user_id, ts,
        |      LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |    FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, dir)
        .withColumn("prev_us", lag(tsUs, 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            (tsUs - col("prev_us")) > lit(1800000000L), 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum("brk").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ---- per-session spans (batch twin of the streaming
    //      StreamOps.completedSessions): break flags via lag, session
    //      numbering via running sum over the same window (one exchange
    //      serves both windows and the final aggregate), then one row
    //      per session. StreamOpsSpec asserts the streaming operator
    //      emits exactly these rows. ----
    Q("q_session_spans", Some(
      """SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  CAST(MIN(ts) AS TIMESTAMP) AS s_start,
        |  CAST(MAX(ts) AS TIMESTAMP) AS s_end,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN prev_us IS NULL
        |             OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
        |           THEN 1 ELSE 0 END AS brk
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |      FROM events)))
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin)) { (s, dir) =>
      sessionSpans(ev(s, dir), gapMinutes = 30)
        .orderBy("user_id", "session_no")
    },

    // ---- as-of (point-in-time) join: each purchase matched to the
    //      latest view at-or-before it by the same user ----
    Q("q_asof_join", Some(
      """SELECT l.event_id, l.user_id,
        |  CAST(r.ts AS TIMESTAMP) AS view_ts,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) - epoch_us(CAST(r.ts AS TIMESTAMP))
        |    AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin)) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_eid"))
      AsOfJoin.asOf(purchases, views, key = "user_id", leftTs = "ts",
          rightTs = "ts", payload = Nil, rightOrder = Seq("view_eid"))
        .select(col("event_id"), col("user_id"),
          col("asof_ts").cast("timestamp_ntz").as("view_ts"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("asof_ts").cast("timestamp"))).as("gap_us"))
        .orderBy("event_id")
    },

    // ---- interval/range join: error events within 5 minutes of a
    //      purchase by the same user (bin-bucketed equijoin, not NL) ----
    Q("q_range_join", Some(
      """SELECT p.event_id AS purchase_id, e.event_id AS r_event_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP))
        |    AS dt_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND abs(epoch_us(CAST(p.ts AS TIMESTAMP)) -
        |         epoch_us(CAST(e.ts AS TIMESTAMP))) <= 300000000
        |ORDER BY purchase_id, r_event_id""".stripMargin)) { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = e.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      RangeJoin.timeProximityJoin(purchases, errors, key = "user_id",
          leftUs = unix_micros(col("ts").cast("timestamp")),
          rightUs = unix_micros(col("ts").cast("timestamp")),
          windowUs = 300000000L, payload = Seq("event_id"))
        .select(col("event_id").as("purchase_id"),
          col("r_event_id"), col("dt_us"))
        .orderBy("purchase_id", "r_event_id")
    },

    // ---- range-frame window: trailing 10-minute value sum per user ----
    Q("q_range_frame", Some(
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    /100.0 AS trailing_10m
        |FROM events ORDER BY event_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(tsUs)
        .rangeBetween(-600000000L, Window.currentRow)
      ev(s, dir)
        .withColumn("trailing_10m", sum(cents(col("value"))).over(w) / lit(100.0))
        .select("event_id", "user_id", "trailing_10m")
        .orderBy("event_id")
    },

    // ---- gaps and islands: consecutive active-day runs per user ----
    // The row_number trick: day - rn is constant within a consecutive run,
    // so islands fall out of one distinct + one window + one group-by, all
    // partitioned on user_id (a single exchange end-to-end).
    Q("q_gaps_islands", Some(
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |           FROM events),
        |g AS (SELECT user_id, d,
        |        (d - DATE '1970-01-01')
        |          - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
        |          AS grp
        |      FROM d)
        |SELECT user_id, MIN(d) AS island_start, MAX(d) AS island_end,
        |  CAST(COUNT(*) AS BIGINT) AS days
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, island_start""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("d")
      ev(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d"))
        .distinct()
        .withColumn("grp",
          datediff(col("d"), lit("1970-01-01").cast("date"))
            - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(min("d").as("island_start"), max("d").as("island_end"),
          count(lit(1)).as("days"))
        .select("user_id", "island_start", "island_end", "days")
        .orderBy("user_id", "island_start")
    },

    // ---- JSON extraction ----
    Q("q_json_kv", Some(
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      ev(s, dir)
        .groupBy("event_type")
        .agg(sum(k).as("sum_k"), max(k).as("max_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---- forward fill (last-observation-carried-forward): the standard
    //      sparse-to-dense time-series repair. Only purchase events carry
    //      an observed price here; every other event inherits the user's
    //      most recent one. One window, one exchange on user_id; values
    //      are raw table doubles carried (not recomputed), so no rounding
    //      is needed. ----
    Q("q_forward_fill", Some(
      """SELECT event_id, user_id,
        |  CASE WHEN event_type = 'purchase' THEN value END AS observed,
        |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled
        |FROM events ORDER BY event_id""".stripMargin)) { (s, dir) =>
      val obs = when(col("event_type") === "purchase", col("value"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .select(col("event_id"), col("user_id"), obs.as("observed"),
          last(obs, ignoreNulls = true).over(w).as("filled"))
        .orderBy("event_id")
    },

    // ---- rolling event-time window (RANGE frame over epoch seconds):
    //      per-user trailing-1h event count + spend. A RANGE frame is
    //      defined by the ORDER BY *value*, so tied timestamps share one
    //      frame and the result is order-deterministic; the epoch-seconds
    //      BIGINT key keeps the frame arithmetic integer-exact in both
    //      engines. Money goes through the exact-cents pattern. ----
    Q("q_rolling_1h", Some(
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT)/100.0
        |    AS spend_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(expr("unix_micros(cast(ts as timestamp)) div 1000000"))
        .rangeBetween(-3600, Window.currentRow)
      ev(s, dir)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).cast("long").as("n_1h"),
          (sum(cents(col("value"))).over(w).cast("long") / lit(100.0))
            .as("spend_1h"))
        .orderBy("event_id")
    },

    // ---- calendar zero-fill (resample-to-daily): generate the full
    //      min..max day spine with sequence()/explode, left-join the
    //      daily aggregate, land 0 on silent days. The spine is one
    //      broadcast row exploded — at any scale the aggregate side
    //      carries the data and the join is broadcast. ----
    Q("q_calendar_fill", Some(
      """WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
        |             CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders),
        |cal AS (SELECT d0 + CAST(i AS INTEGER) AS day
        |        FROM (SELECT d0,
        |                unnest(range(0, date_diff('day', d0, d1) + 1)) AS i
        |              FROM b)),
        |agg AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
        |          CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        |            AS BIGINT)/100.0 AS revenue
        |        FROM orders GROUP BY day)
        |SELECT cal.day, COALESCE(agg.n, 0) AS n,
        |  COALESCE(agg.revenue, 0.0) AS revenue
        |FROM cal LEFT JOIN agg ON cal.day = agg.day
        |ORDER BY cal.day""".stripMargin)) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val spine = o
        .agg(min(col("o_orderdate").cast("date")).as("d0"),
          max(col("o_orderdate").cast("date")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val agg = o.groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("revenue"))
      spine.join(agg, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("day")
    },

    // ---- weekly cohort retention: users grouped by first-seen week,
    //      distinct-user counts per (cohort, weeks-since) cell — the
    //      standard retention matrix. The cohort assignment is a
    //      window-min over ONE user_id exchange; the matrix is a
    //      (cohort, offset)-keyed distinct count. All integer. ----
    Q("q_cohort_retention", Some(
      """WITH e AS (SELECT user_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS BIGINT)
        |      AS wk
        |  FROM events),
        |c AS (SELECT *, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
        |      FROM e)
        |SELECT cohort_wk, CAST(wk - cohort_wk AS BIGINT) AS weeks_since,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM c GROUP BY cohort_wk, weeks_since
        |ORDER BY cohort_wk, weeks_since""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id")
      ev(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 604800000000")
            .as("wk"))
        .withColumn("cohort_wk", min("wk").over(w))
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("weeks_since"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_wk", "weeks_since")
    },

    // ---- ordered conversion funnel: view → click-after-view →
    //      purchase-after-click per user, STRICT event-time ordering
    //      (an out-of-order click never counts). Three conditional
    //      window-mins over ONE user_id partitioning — each stage's
    //      cutoff is the previous stage's window result, and the final
    //      per-user collapse reuses the same exchange, so the whole
    //      funnel costs one corpus shuffle at any event volume. ----
    Q("q_funnel_stages", Some(
      s"""WITH $sqlFunnelCtes
        |SELECT user_id, t1 AS view_us, t2 AS click_us, t3 AS purchase_us,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1
        |            ELSE 0 END AS INTEGER) AS stage
        |FROM f ORDER BY user_id""".stripMargin)) {
      (s, dir) =>
      val w = Window.partitionBy("user_id")
      ev(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("us") > col("t1"),
            col("us"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("us") > col("t2"),
            col("us"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("view_us"), max("t2").as("click_us"),
          max("t3").as("purchase_us"))
        .withColumn("stage",
          when(col("purchase_us").isNotNull, 3)
            .when(col("click_us").isNotNull, 2)
            .when(col("view_us").isNotNull, 1)
            .otherwise(0))
        .orderBy("user_id")
    },

    // ---- funnel latency: the time-to-convert distribution over fully
    //      converted users (view→click, click→purchase, end-to-end) —
    //      the product metric a funnel exists to produce. Durations are
    //      exact integer µs; percentiles are the interpolated exact
    //      kind on those integers (the q_percentiles convention:
    //      Spark's percentile and DuckDB's quantile_cont interpolate
    //      identically on identical integers). Rides the SAME shared
    //      funnel CTE algebra as q_funnel_stages, then one global
    //      single-row aggregate over the converted slice. ----
    Q("q_funnel_latency", Some(
      s"""WITH $sqlFunnelCtes
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  quantile_cont(t2 - t1, 0.5) AS p50_click_us,
        |  quantile_cont(t3 - t2, 0.5) AS p50_purchase_us,
        |  quantile_cont(t3 - t1, 0.5) AS p50_total_us,
        |  quantile_cont(t3 - t1, 0.9) AS p90_total_us,
        |  CAST(MAX(t3 - t1) AS BIGINT) AS max_total_us
        |FROM f WHERE t3 IS NOT NULL""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id")
      ev(s, dir)
        .select(col("user_id"), col("event_type"), tsUs.as("us"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("us") > col("t1"),
            col("us"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("us") > col("t2"),
            col("us"))).over(w))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .where(col("t3").isNotNull)
        .agg(count(lit(1)).as("n_converted"),
          percentile(col("t2") - col("t1"), lit(0.5)).as("p50_click_us"),
          percentile(col("t3") - col("t2"), lit(0.5)).as("p50_purchase_us"),
          percentile(col("t3") - col("t1"), lit(0.5)).as("p50_total_us"),
          percentile(col("t3") - col("t1"), lit(0.9)).as("p90_total_us"),
          max(col("t3") - col("t1")).cast("long").as("max_total_us"))
    },

    // ---- CDC upsert apply (MERGE-INTO resolution): treat the event
    //      stream as a changelog keyed by user_id — the LAST event per
    //      key in (ts, event_id) order wins, and a final 'error' event
    //      acts as a DELETE tombstone. This is exactly the
    //      merge-on-read compaction a Delta/Hudi-style table runs at
    //      100 TB: one keyed exchange (max_by carries the whole
    //      payload), no window sort, no self-join. ----
    Q("q_cdc_upsert", Some(
      // The oracle states last-writer-wins as a plain-ANSI row_number
      // pick (DuckDB's max_by lacks composite ordering keys); the Spark
      // side uses max_by over a (us, event_id) struct — same total
      // order, same survivors, one aggregate exchange instead of a
      // window sort.
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ROUND(value*100) AS BIGINT) AS value_cents,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY us DESC, event_id DESC) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
        |      AS n_versions
        |  FROM e)
        |SELECT user_id, value_cents, us AS last_us, n_versions
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin)) {
      (s, dir) =>
      // max_by on a (us, event_id) struct: ties impossible (event_id
      // unique), so last-writer-wins is total and engine-agnostic.
      val ord = struct(col("us"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .groupBy("user_id")
        .agg(max_by(col("event_type"), ord).as("op"),
          max_by(col("value_cents"), ord).as("value_cents"),
          max(col("us")).as("last_us"),
          count(lit(1)).as("n_versions"))
        .where(col("op") =!= "error")
        .select("user_id", "value_cents", "last_us", "n_versions")
        .orderBy("user_id")
    },

    // ---- SCD type-2 dimension build: collapse each user's event_type
    //      stream into change-only intervals (valid_from, valid_to,
    //      is_current) — the standard slowly-changing-dimension load.
    //      A lag() change detector and the lead() interval close share
    //      ONE user_id exchange; no self-join, no gaps-islands group
    //      number needed because only change rows survive. ----
    Q("q_scd2", Some(
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |           FROM events),
        |chg AS (SELECT *,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY us, event_id) AS prev_t
        |  FROM e),
        |iv AS (SELECT user_id, event_type AS status, us AS valid_from,
        |    LEAD(us) OVER (PARTITION BY user_id
        |                   ORDER BY us, event_id) AS valid_to
        |  FROM chg WHERE prev_t IS NULL OR prev_t <> event_type)
        |SELECT user_id, status, valid_from, valid_to,
        |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_current
        |FROM iv ORDER BY user_id, valid_from""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("prev_t", lag("event_type", 1).over(w))
        .where(col("prev_t").isNull || col("prev_t") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("status"),
          col("event_id"), col("us").as("valid_from"))
        .withColumn("valid_to",
          lead("valid_from", 1).over(
            Window.partitionBy("user_id").orderBy("valid_from", "event_id")))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1).otherwise(0))
        .select("user_id", "status", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from")
    },

    // ---- exact rolling 7-day active users (DAU/WAU): a user active on
    //      day d is in the window of days d..d+6, so exploding each
    //      distinct (user, day) into its 7 target windows turns the
    //      rolling-distinct problem into a plain keyed distinct count —
    //      BOUNDED 7× fanout, where the naive day×day range join is
    //      quadratic in the day span and a per-day window over users
    //      serializes. The WAU grouping key is the window day, whose
    //      cardinality is the calendar — even with 10⁹ users per day no
    //      reducer sees more than one day's distinct-user partials. ----
    Q("q_rolling_active_users", Some(
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |x AS (SELECT user_id, day + i AS wday
        |      FROM (SELECT user_id, day, unnest(range(0, 7)) AS i FROM ud)),
        |wau AS (SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |          AS wau FROM x GROUP BY wday),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud
        |        GROUP BY day)
        |SELECT day, COALESCE(dau, 0) AS dau, wau
        |FROM wau LEFT JOIN dau USING (day) ORDER BY day""".stripMargin)) {
      (s, dir) =>
      // Single pipeline, no branch reuse: the offset label i rides along
      // the explode, so dau is just "distinct users where i = 0" inside
      // the SAME (day-keyed) aggregate that computes wau — one distinct
      // (user, day) exchange, one expand aggregate, no self-join.
      val ud = ev(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .distinct()
      ud.select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"),
          col("day"))
        .select(col("user_id"), col("i"), (col("day") + col("i")).as("day"))
        .groupBy("day")
        .agg(
          coalesce(countDistinct(when(col("i") === 0, col("user_id"))),
            lit(0L)).as("dau"),
          countDistinct("user_id").as("wau"))
        .select("day", "dau", "wau")
        .orderBy("day")
    },

    // ---- peak concurrent sessions per day: sweep-line over session
    //      interval endpoints (+1 at start, -1 just after end — closed
    //      intervals, so an instant session still peaks at 1), running
    //      concurrency via the DISTRIBUTED prefix sum (Packing
    //      .globalPrefixSum sharded by the endpoint's day — a monotone
    //      coarsening of the time order), then a per-day max that
    //      reuses the shard partitioning. No global single-partition
    //      window anywhere — the classic scale trap for sweep-lines.
    //      Reported days are those carrying an endpoint; ties at one
    //      microsecond carry equal deltas, so the running values are a
    //      permutation-invariant multiset and the max is exact. ----
    Q("q_concurrent_sessions", Some(
      """WITH spans AS (
        |  SELECT user_id, session_no,
        |    MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS e_us
        |  FROM (
        |    SELECT user_id, ts,
        |      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_no
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        CASE WHEN prev_us IS NULL
        |               OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us
        |                  > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM (
        |        SELECT user_id, ts, event_id,
        |          LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            AS prev_us
        |        FROM events)))
        |  GROUP BY user_id, session_no),
        |pts AS (SELECT s_us AS us, 1 AS delta FROM spans
        |        UNION ALL
        |        SELECT e_us + 1 AS us, -1 AS delta FROM spans),
        |run AS (SELECT us, delta,
        |    SUM(delta) OVER (ORDER BY us, delta
        |      ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM pts)
        |SELECT us // 86400000000 AS day, CAST(MAX(conc) AS BIGINT)
        |    AS peak_concurrent
        |FROM run GROUP BY day ORDER BY day""".stripMargin)) { (s, dir) =>
      val spans = sessionSpans(ev(s, dir), gapMinutes = 30)
        .select(unix_micros(col("s_start").cast("timestamp")).as("s_us"),
          unix_micros(col("s_end").cast("timestamp")).as("e_us"))
      // explode-of-array, not union: a union would evaluate the whole
      // sessionization subtree once per branch
      val pts = spans.select(explode(array(
          struct(col("s_us").as("us"), lit(1L).as("delta")),
          struct((col("e_us") + 1).as("us"), lit(-1L).as("delta"))))
          .as("p"))
        .select(col("p.us").as("us"), col("p.delta").as("delta"))
      val run = Packing.globalPrefixSum(pts,
        shardCol = expr("us div 86400000000"),
        orderCols = Seq(col("us"), col("delta")),
        valueCol = col("delta"), psCol = "conc")
      run.groupBy(expr("us div 86400000000").as("day"))
        .agg(max("conc").as("peak_concurrent"))
        .orderBy("day")
    },

    // ---- time-weighted average (the observability/finance aggregate:
    //      a step-function value sampled at irregular times, averaged
    //      by holding interval — arithmetic means over-weight bursts).
    //      Exact integers end to end: value in cents, intervals in µs,
    //      TWA = numerator DIV span (both BIGINT; |num| <= 1e4 cents ×
    //      1.6e13 µs span << 2^63). lead() and the aggregate share ONE
    //      user_id exchange; same-ts ties order by event_id so the
    //      zero-weight assignment is engine-deterministic. Single-event
    //      users (span 0) are excluded — no average exists. The bare
    //      DIV is safe ONLY because value >= 0 in this schema (num >= 0,
    //      so Spark's truncation and DuckDB's floor agree); a signed
    //      value column would need the power-iteration sign-outside-
    //      division pattern. ----
    Q("q_time_weighted_avg", Some(
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
        |l AS (SELECT user_id, vc, us,
        |    LEAD(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS nxt FROM e),
        |a AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN nxt IS NOT NULL
        |      THEN vc * (nxt - us) ELSE 0 END) AS BIGINT) AS num,
        |    CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
        |    COUNT(*) AS n_events
        |  FROM l GROUP BY user_id)
        |SELECT user_id, n_events, span_us,
        |  CAST(num // span_us AS BIGINT) AS twa_cents
        |FROM a WHERE span_us > 0 ORDER BY user_id""".stripMargin)) {
      (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev(s, dir)
        .select(col("user_id"), col("event_id"), tsUs.as("us"),
          cents(col("value")).as("vc"))
        .withColumn("nxt", lead("us", 1).over(w))
        .groupBy("user_id")
        .agg(
          sum(when(col("nxt").isNotNull,
            col("vc") * (col("nxt") - col("us"))).otherwise(0L))
            .cast("long").as("num"),
          (max("us") - min("us")).cast("long").as("span_us"),
          count(lit(1)).as("n_events"))
        .where(col("span_us") > 0)
        .select(col("user_id"), col("n_events"), col("span_us"),
          expr("num DIV span_us").as("twa_cents"))
        .orderBy("user_id")
    },

    // ---- Spark's BUILT-IN session_window operator (the native
    //      SessionWindow aggregation path — complementing q_sessionize's
    //      hand-rolled lag/cumsum form, so both sessionization surfaces
    //      an engine offers are oracle-pinned against the same classic
    //      gaps-and-islands SQL). Merge semantics: an event extends the
    //      session while its ts falls INSIDE [start, last + gap) — a gap
    //      of exactly 30 min starts a new session — so the mirror breaks
    //      on diff >= gap (q_sessionize's convention is > gap; both are
    //      stated explicitly because the boundary differs). The plan
    //      shuffles once on user_id; session end = last event + gap by
    //      definition of the operator. ----
    Q("q_session_window", Some(
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |l AS (SELECT user_id, us, LAG(us) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS prev_us FROM e),
        |b AS (SELECT user_id, us, CASE WHEN prev_us IS NULL
        |        OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM l),
        |s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id
        |        ORDER BY us ROWS UNBOUNDED PRECEDING) AS sess FROM b)
        |SELECT user_id, MIN(us) AS s_start_us,
        |  MAX(us) + 1800000000 AS s_end_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, s_start_us""".stripMargin)) { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts").cast("timestamp"), "30 minutes")
            .as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("s_start_us"),
          unix_micros(col("sw.end")).as("s_end_us"),
          col("n_events"))
        .orderBy("user_id", "s_start_us")
    },

    // ---- first-order Markov transition matrix over per-user event
    //      sequences: what powers next-event prediction and anomalous-
    //      flow detection. lead() over the (user_id)-keyed sequence is
    //      the only wide stage (one keyed exchange, scales with users);
    //      the transition aggregate is |types|² ≤ 25 rows, and the
    //      row-normalizing window runs on that metadata-sized frame.
    //      Probabilities are emitted as exact integer parts-per-million
    //      (floor division) — no float accumulation anywhere. ----
    Q("q_markov_transitions", Some(
      """WITH seq AS (SELECT user_id, event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |trans AS (SELECT event_type AS from_type, next_type AS to_type,
        |    COUNT(*) AS n_trans
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  CAST((n_trans * 1000000) //
        |    SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS prob_ppm
        |FROM trans ORDER BY from_type, to_type""".stripMargin)) {
      (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = ev(s, dir)
        .select(col("event_type").as("from_type"),
          lead("event_type", 1).over(w).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_trans"))
      trans
        .withColumn("prob_ppm", expr("(n_trans * 1000000) div " +
          "sum(n_trans) over (partition by from_type)"))
        .orderBy("from_type", "to_type")
    })
}
