package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.TimeSeries
import graft.model.Tables

/** Time-series queries: as-of join, sessionization, OHLC bars
  * (north-star X7/X8).
  */
object TimeSeriesQueriesImpl {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ---- asof_clicks --------------------------------------------------

  /** As-of join within events: each purchase gets the most recent click
    * (click.ts <= purchase.ts) by the same user — union + last-non-null
    * carry-forward, one shuffle (see [[TimeSeries.asofJoin]]).
    */
  def asofClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"))
    TimeSeries.asofJoin(purchases, clicks, "user_id", "ts",
      carryCols = Seq("value", "click_ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_click_ts").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  private val asofClicksOracle =
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS tag, event_id, value,
      |         NULL::DOUBLE AS c_value, NULL::TIMESTAMP AS c_click_ts
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 0 AS tag, NULL, NULL, value, ts
      |  FROM events WHERE event_type = 'click'),
      |c AS (
      |  SELECT *,
      |    last_value(c_click_ts IGNORE NULLS) OVER w AS last_click_ts,
      |    last_value(c_value IGNORE NULLS) OVER w AS last_click_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ts, value, last_click_ts, last_click_value
      |FROM c WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  // ---- asof_clicks_native (custom Catalyst operator) ---------------

  /** Same semantics as asof_clicks, but through the NATIVE as-of join
    * operator (graft.plans: AsOfJoinPlan logical node + AsOfStrategy +
    * sort-merge AsOfJoinExec with O(1) merge state). Shares the oracle —
    * the two implementations must agree bit-for-bit.
    */
  def asofClicksNative(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"))
    graft.plans.AsOf.join(purchases, clicks, "user_id", "ts",
      carryCols = Seq("value", "click_ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_click_ts").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  // ---- asof_clicks_bucketed (skew-safe variant) --------------------

  /** Same semantics as asof_clicks, through the SKEW-SAFE time-bucketed
    * operator ([[TimeSeries.asofJoinBucketed]]): each user's timeline is
    * split into daily buckets so a hypertraded key parallelizes instead
    * of funneling one task. Shares the asof_clicks oracle — all three
    * as-of implementations must agree bit-for-bit.
    */
  def asofClicksBucketed(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"))
    TimeSeries.asofJoinBucketed(purchases, clicks, "user_id", "ts",
      carryCols = Seq("value", "click_ts"), bucketSeconds = 86400L)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_click_ts").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  // ---- asof_clicks_tol ----------------------------------------------

  /** As-of with a 1-hour tolerance: the matched click must be within
    * 3600s of the purchase or the carried values null out (pandas
    * merge_asof `tolerance` semantics).
    */
  def asofClicksTol(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"))
    TimeSeries.asofJoin(purchases, clicks, "user_id", "ts",
      carryCols = Seq("value", "click_ts"),
      direction = "backward", toleranceSeconds = Some(3600L))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_click_ts").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  private val asofClicksTolOracle =
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS tag, event_id, value,
      |         NULL::DOUBLE AS c_value, NULL::TIMESTAMP AS c_click_ts
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 0 AS tag, NULL, NULL, value, ts
      |  FROM events WHERE event_type = 'click'),
      |c AS (
      |  SELECT *,
      |    last_value(c_click_ts IGNORE NULLS) OVER w AS m_ts,
      |    last_value(c_value IGNORE NULLS) OVER w AS m_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ts, value,
      |  CASE WHEN epoch(ts) - epoch(m_ts) <= 3600 THEN m_ts END
      |    AS last_click_ts,
      |  CASE WHEN epoch(ts) - epoch(m_ts) <= 3600 THEN m_value END
      |    AS last_click_value
      |FROM c WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  // ---- asof_forward -------------------------------------------------

  /** Forward as-of: each click gets the NEXT purchase (purchase.ts >=
    * click.ts) by the same user — time-to-conversion shape.
    */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("purchase_ts"))
    TimeSeries.asofJoin(clicks, purchases, "user_id", "ts",
      carryCols = Seq("value", "purchase_ts"), direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_purchase_ts").as("next_purchase_ts"),
        col("asof_value").as("next_purchase_value"))
      .orderBy("event_id")
  }

  private val asofForwardOracle =
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS tag, event_id,
      |         NULL::DOUBLE AS c_value, NULL::TIMESTAMP AS c_pts
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, 0 AS tag, NULL, value, ts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT *,
      |    last_value(c_pts IGNORE NULLS) OVER w AS next_purchase_ts,
      |    last_value(c_value IGNORE NULLS) OVER w AS next_purchase_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, tag
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ts, next_purchase_ts, next_purchase_value
      |FROM c WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  // ---- asof_forward_native ------------------------------------------

  /** Same forward semantics through the custom AsOfJoinExec (forward =
    * the backward exec on negated epoch time); shares the oracle with
    * asof_forward — the two implementations must agree bit-for-bit.
    */
  def asofForwardNative(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("purchase_ts"))
    graft.plans.AsOf.join(clicks, purchases, "user_id", "ts",
      carryCols = Seq("value", "purchase_ts"), direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_purchase_ts").as("next_purchase_ts"),
        col("asof_value").as("next_purchase_value"))
      .orderBy("event_id")
  }

  // ---- sessions -----------------------------------------------------

  /** Gap-based sessionization per user (24h inactivity gap). */
  def sessions(s: SparkSession, dir: String): DataFrame =
    TimeSeries.sessionStats(
      events(s, dir).select("user_id", "ts"), "user_id", "ts",
      gapSeconds = 86400L)
      .orderBy("user_id", "session_id")

  private val sessionsOracle =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT)
      |              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 86400
      |         THEN 1 ELSE 0 END AS nw
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts
      |                  ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(floor(epoch(max(ts))) AS BIGINT)
      |    - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
      |FROM s
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---- ohlc_daily ---------------------------------------------------

  /** Daily OHLC bars per event_type — the market-data resample classic. */
  def ohlcDaily(s: SparkSession, dir: String): DataFrame =
    TimeSeries.ohlc(events(s, dir), "event_type", "ts", "value", "1 day")
      .orderBy("event_type", "bucket_start")

  private val ohlcDailyOracle =
    """SELECT event_type,
      |  epoch_ms(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400000) AS bucket_start,
      |  arg_min(value, ts) AS open,
      |  max(value) AS high,
      |  min(value) AS low,
      |  arg_max(value, ts) AS close,
      |  count(value) AS volume
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---- sessions_native ----------------------------------------------

  /** Spark's native session_window operator (X7 stretch): sessions merge
    * while consecutive events are < gap apart; window end = last event
    * + gap (end-exclusive). The oracle reproduces exactly that with a
    * lag-gap cumulative sum on exact microsecond arithmetic.
    */
  def sessionsNative(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "24 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_event"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")

  private val sessionsNativeOracle =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 86400000000
      |         THEN 1 ELSE 0 END AS nw
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 24 HOUR AS session_end,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---- technical indicators (extra/Indicators) ----------------------

  /** DECIMAL-exact daily mean price CTE shared by the indicator
    * oracles — mirrors [[graft.extra.Indicators.dailyMean]] exactly
    * (sum in DECIMAL(18,6), one double division, round 6).
    */
  private val dailyCte =
    """d0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Bollinger bands per event_type: 7-day rolling mean ± 2σ of the
    * daily mean value (DECIMAL-exact frame sums; sample stddev).
    */
  def bollingerDaily(s: SparkSession, dir: String): DataFrame =
    graft.extra.Indicators.bollinger(events(s, dir), "event_type", "ts",
        "value", windowDays = 7, k = 2.0)
      .orderBy("event_type", "day")

  private val bollingerOracle =
    s"""WITH $dailyCte,
       |b AS (SELECT event_type, day, px,
       |  CAST(sum(CAST(px AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sm,
       |  CAST(sum(CAST(round(px*px, 12) AS DECIMAL(30,12))) OVER w
       |       AS DOUBLE) AS sq,
       |  CAST(count(px) OVER w AS DOUBLE) AS n
       |  FROM d0
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
       |c AS (SELECT event_type, day, px, round(sm/n, 6) AS ma,
       |  CASE WHEN n >= 2 THEN
       |    round(sqrt(greatest((sq - sm*sm/n)/(n - 1.0), 0.0)), 6)
       |  END AS sd,
       |  CAST(n AS BIGINT) AS n_days FROM b)
       |SELECT event_type, day, px, ma, sd,
       |  round(ma + 2.0*sd, 6) AS upper,
       |  round(ma - 2.0*sd, 6) AS lower, n_days
       |FROM c ORDER BY event_type, day""".stripMargin

  /** RSI(14), SMA form, per event_type over daily mean values. */
  def rsiDaily(s: SparkSession, dir: String): DataFrame =
    graft.extra.Indicators.rsi(events(s, dir), "event_type", "ts",
        "value", windowDays = 14)
      .orderBy("event_type", "day")

  private val rsiOracle =
    s"""WITH $dailyCte,
       |g AS (SELECT event_type, day, px,
       |  round(px - lag(px) OVER (PARTITION BY event_type ORDER BY day),
       |        6) AS diff
       |  FROM d0),
       |f AS (SELECT event_type, day, px,
       |  CAST(sum(CASE WHEN diff IS NOT NULL THEN
       |    CAST(CASE WHEN diff > 0 THEN diff ELSE 0 END AS DECIMAL(18,6))
       |  END) OVER w AS DOUBLE) AS gs,
       |  CAST(sum(CASE WHEN diff IS NOT NULL THEN
       |    CAST(CASE WHEN diff < 0 THEN -diff ELSE 0 END AS DECIMAL(18,6))
       |  END) OVER w AS DOUBLE) AS ls,
       |  sum(CASE WHEN diff IS NOT NULL THEN 1 ELSE 0 END) OVER w AS nd
       |  FROM g
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       |SELECT event_type, day, px,
       |  CASE WHEN nd < 14 THEN NULL
       |       WHEN ls = 0 THEN 100.0
       |       ELSE round(100.0 - 100.0/(1.0 + gs/ls), 6) END AS rsi
       |FROM f ORDER BY event_type, day""".stripMargin

  /** EWMA(α=0.3) of the daily mean value per event_type — the oracle
    * replays the sequential recurrence with a recursive CTE.
    */
  def ewmaDaily(s: SparkSession, dir: String): DataFrame =
    graft.extra.Indicators.ewma(events(s, dir), "event_type", "ts",
        "value", alpha = 0.3)
      .orderBy("event_type", "day")

  private val ewmaOracle =
    s"""WITH RECURSIVE $dailyCte,
       |d AS (SELECT event_type, day, px,
       |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM d0),
       |r AS (
       |  SELECT event_type, day, rn, px, px AS ewma FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.event_type, d.day, d.rn, d.px,
       |         round(0.3*d.px + 0.7*r.ewma, 6)
       |  FROM d JOIN r ON d.event_type = r.event_type AND d.rn = r.rn + 1)
       |SELECT event_type, day, px, ewma
       |FROM r ORDER BY event_type, day""".stripMargin

  /** Two-sided CUSUM drift detection over the daily mean series per
    * event_type ([[graft.extra.Indicators.cusum]], slack 0.5,
    * threshold 4.0) — every recurrence intermediate is a 6-dp value,
    * so the oracle's recursive CTE replays the fold exactly.
    */
  def cusumDaily(s: SparkSession, dir: String): DataFrame =
    graft.extra.Indicators.cusum(events(s, dir), "event_type", "ts",
        "value", slack = 0.5, threshold = 4.0)
      .orderBy("event_type", "day")

  private val cusumOracle =
    s"""WITH RECURSIVE $dailyCte,
       |st AS (SELECT event_type, count(*) AS n,
       |    CAST(sum(CAST(px AS DECIMAL(18,6))) AS DOUBLE) AS sm,
       |    CAST(sum(CAST(round(px*px, 12) AS DECIMAL(30,12)))
       |      AS DOUBLE) AS sq
       |  FROM d0 GROUP BY 1),
       |d AS (SELECT d0.event_type, d0.day, d0.px,
       |    CASE WHEN st.n < 2
       |        OR (st.sq - st.sm*st.sm/st.n)/(st.n - 1) <= 0 THEN 0.0
       |      ELSE round((d0.px - round(st.sm/st.n, 6))
       |        / round(sqrt((st.sq - st.sm*st.sm/st.n)/(st.n - 1)), 6),
       |        6) END AS z,
       |    row_number() OVER (PARTITION BY d0.event_type
       |      ORDER BY d0.day) AS rn
       |  FROM d0 JOIN st USING (event_type)),
       |r AS (
       |  SELECT event_type, day, rn, px, z,
       |    round(greatest(0, z - 0.5), 6) AS sp,
       |    round(greatest(0, -z - 0.5), 6) AS sn
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.event_type, d.day, d.rn, d.px, d.z,
       |    round(greatest(0, r.sp + d.z - 0.5), 6),
       |    round(greatest(0, r.sn - d.z - 0.5), 6)
       |  FROM d JOIN r ON d.event_type = r.event_type
       |    AND d.rn = r.rn + 1)
       |SELECT event_type, day, px, z,
       |  sp AS cusum_pos, sn AS cusum_neg,
       |  (sp > 4.0 OR sn > 4.0) AS alarm
       |FROM r ORDER BY event_type, day""".stripMargin

  /** Interval join: purchase × click by the same user within ±6h —
    * bucketed equijoin, never a per-key cross join (see
    * [[TimeSeries.intervalJoin]]).
    */
  def intervalJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    TimeSeries.intervalJoin(purchases, clicks, "user_id", "p_ts", "c_ts",
        toleranceSeconds = 6 * 3600L)
      .select("user_id", "purchase_id", "click_id", "delta_us")
      .orderBy("purchase_id", "click_id")
  }

  private val intervalJoinOracle =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |  epoch_us(c.ts) - epoch_us(p.ts) AS delta_us
      |FROM events p JOIN events c ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 21600000000
      |ORDER BY purchase_id, click_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("interval_join",
      "purchase x click pairs within 6h: bucketed range equijoin",
      intervalJoinQ, Some(intervalJoinOracle)),
    QueryDef("bollinger_daily",
      "Bollinger bands: 7-day rolling mean +/- 2 sigma per event_type",
      bollingerDaily, Some(bollingerOracle)),
    QueryDef("rsi_daily",
      "RSI(14), SMA form, over daily mean values per event_type",
      rsiDaily, Some(rsiOracle)),
    QueryDef("ewma_daily",
      "EWMA(0.3) daily series per event_type (recursive-CTE oracle)",
      ewmaDaily, Some(ewmaOracle)),
    QueryDef("cusum_daily",
      "two-sided CUSUM drift detector over the daily series (6-dp " +
        "recurrence, recursive-CTE oracle)",
      cusumDaily, Some(cusumOracle)),
    QueryDef("sessions_native",
      "native session_window sessions (gap-merge, end = last + gap)",
      sessionsNative, Some(sessionsNativeOracle)),
    QueryDef("asof_clicks",
      "as-of join: purchases x latest prior click per user",
      asofClicks, Some(asofClicksOracle)),
    QueryDef("asof_clicks_native",
      "same as-of semantics via the custom AsOfJoinExec operator",
      asofClicksNative, Some(asofClicksOracle)),
    QueryDef("asof_clicks_bucketed",
      "same as-of semantics via the skew-safe time-bucketed operator",
      asofClicksBucketed, Some(asofClicksOracle)),
    QueryDef("asof_clicks_tol",
      "as-of with 1h tolerance (stale matches null out)",
      asofClicksTol, Some(asofClicksTolOracle)),
    QueryDef("asof_forward",
      "forward as-of: click -> next purchase (time-to-conversion)",
      asofForward, Some(asofForwardOracle)),
    QueryDef("asof_forward_native",
      "same forward semantics via the custom AsOfJoinExec operator",
      asofForwardNative, Some(asofForwardOracle)),
    QueryDef("sessions",
      "gap-based sessionization (24h) per user",
      sessions, Some(sessionsOracle)),
    QueryDef("ohlc_daily",
      "daily OHLC bars per event_type",
      ohlcDaily, Some(ohlcDailyOracle)))
}
