package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Features
import graft.ops.Features.FeatureConfig

/** Reference-parity queries (SURVEY.md §2.2-§2.5), expressed over the
  * driver's `events` table — the tick-stream analog (event_type ~ symbol,
  * value ~ price, ts ~ event_time).
  *
  * Determinism rules for every oracle-checked query here:
  *   - aggregate choices are order-independent (min_by/max_by, not first)
  *   - doubles produced by transcendental math are rounded to 6 dp in BOTH
  *     engines; money/qty sums go through DECIMAL so summation order is
  *     irrelevant
  *   - total ORDER BY on a unique key set in both engines
  */
object CoreQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** The flagship: reference `compute_features` semantics
    * (spark_streaming.py:73-118) — sliding event-time window per key.
    * Window 1 hour / slide 15 minutes (the reference's 60s/10s geometry,
    * W/S = 4..6, scaled to the events table's 30-day span).
    */
  def featuresSliding(s: SparkSession, dir: String): DataFrame = {
    val cfg = FeatureConfig(
      window = "1 hour", slide = Some("15 minutes"),
      keyCol = "event_type", valueCol = "value", timeCol = "ts")
    Features.compute(events(s, dir), cfg)
      .withColumn("log_return", round(col("log_return"), 6))
      .withColumn("volatility", round(col("volatility"), 6))
      .orderBy("event_type", "window_start")
  }

  private val featuresSlidingOracle =
    """WITH e AS (
      |  SELECT event_type, value, ts,
      |         CAST(floor(epoch(ts)/900) AS BIGINT) AS b
      |  FROM events
      |), w AS (
      |  SELECT e.event_type, e.value, e.ts,
      |         epoch_ms((e.b - k.k)*900000) AS window_start
      |  FROM e CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) k
      |)
      |SELECT event_type, window_start,
      |       window_start + INTERVAL 1 HOUR AS window_end,
      |       arg_min(value, ts) AS first_price,
      |       arg_max(value, ts) AS last_price,
      |       round(CASE WHEN arg_max(value, ts) > 0 AND arg_min(value, ts) > 0
      |             THEN ln(arg_max(value, ts)/arg_min(value, ts)) END, 6) AS log_return,
      |       round(CASE WHEN arg_max(value, ts) > 0 AND arg_min(value, ts) > 0
      |             THEN abs(ln(arg_max(value, ts)/arg_min(value, ts))) END
      |             / sqrt(count(value)+1), 6) AS volatility,
      |       count(value) AS num_ticks,
      |       max(ts) AS max_event_time
      |FROM w
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Tumbling (window == slide) variant, 1-day buckets. */
  def featuresTumbling(s: SparkSession, dir: String): DataFrame = {
    val cfg = FeatureConfig(
      window = "1 day", slide = None,
      keyCol = "event_type", valueCol = "value", timeCol = "ts")
    Features.compute(events(s, dir), cfg)
      .withColumn("log_return", round(col("log_return"), 6))
      .withColumn("volatility", round(col("volatility"), 6))
      .orderBy("event_type", "window_start")
  }

  private val featuresTumblingOracle =
    """SELECT event_type,
      |       epoch_ms(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400000) AS window_start,
      |       epoch_ms(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400000) + INTERVAL 1 DAY AS window_end,
      |       arg_min(value, ts) AS first_price,
      |       arg_max(value, ts) AS last_price,
      |       round(CASE WHEN arg_max(value, ts) > 0 AND arg_min(value, ts) > 0
      |             THEN ln(arg_max(value, ts)/arg_min(value, ts)) END, 6) AS log_return,
      |       round(CASE WHEN arg_max(value, ts) > 0 AND arg_min(value, ts) > 0
      |             THEN abs(ln(arg_max(value, ts)/arg_min(value, ts))) END
      |             / sqrt(count(value)+1), 6) AS volatility,
      |       count(value) AS num_ticks,
      |       max(ts) AS max_event_time
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** True intra-window volatility (stddev of per-tick log returns) —
    * the fidelity upgrade of SURVEY.md §2.3 A6, tumbling 1-day windows.
    */
  def volatilityTrue(s: SparkSession, dir: String): DataFrame = {
    val cfg = FeatureConfig(
      window = "1 day", slide = None,
      keyCol = "event_type", valueCol = "value", timeCol = "ts")
    Features.computeTrueVolatility(events(s, dir), cfg)
      .withColumn("volatility_true", round(col("volatility_true"), 6))
      .orderBy("event_type", "window_start")
  }

  private val volatilityTrueOracle =
    """WITH r AS (
      |  SELECT event_type, ts, value,
      |         CASE WHEN value > 0 AND lag(value) OVER
      |                (PARTITION BY event_type ORDER BY ts) > 0
      |              THEN ln(value / lag(value) OVER
      |                (PARTITION BY event_type ORDER BY ts)) END AS tick_return
      |  FROM events
      |)
      |SELECT event_type,
      |       epoch_ms(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400000) AS window_start,
      |       epoch_ms(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400000) + INTERVAL 1 DAY AS window_end,
      |       round(stddev_samp(tick_return), 6) AS volatility_true,
      |       count(value) AS num_ticks
      |FROM r
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Serving-layer KPI row (streamlit_app.py:53-59): total rows + mean
    * value. DECIMAL-summed so partial-aggregation order can't shift bits.
    */
  def kpi(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events(s, dir).agg(
      count(lit(1)).as("total_rows"),
      round(sum(col("value").cast(DecimalType(18, 2))).cast("double") /
        count(col("value")), 6).as("avg_value"))
  }

  private val kpiOracle =
    """SELECT count(*) AS total_rows,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |             / count(value), 6) AS avg_value
      |FROM events""".stripMargin

  /** Serving-layer recent slice (streamlit_app.py:23-32): time-range
    * filter + IN-list symbol filter + projection + order. Fixed literal
    * cutoff (no wall clock in compared output — SURVEY.md §7.4 #2).
    */
  def recentSlice(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("ts") >= lit("2024-01-24 00:00:00").cast("timestamp") &&
        col("event_type").isin("click", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")

  private val recentSliceOracle =
    """SELECT event_id, ts, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
      |  AND event_type IN ('click', 'purchase')
      |ORDER BY event_id""".stripMargin

  /** Pivot wide reshape (streamlit_app.py:69-80): per-day event counts,
    * one column per event_type. Explicit pivot values keep the schema
    * deterministic; coalesce(0) matches SQL conditional-count semantics.
    */
  def pivotDaily(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("day")
  }

  private val pivotDailyOracle =
    """SELECT date_trunc('day', ts) AS day,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Pivot with last-by-time values — the reference dashboard's exact
    * reshape (streamlit_app.py:69-80: pivot_table(aggfunc='last') over a
    * ts-ordered frame): last observed value per day per type, wide.
    * `max_by(value, ts)` is the deterministic form of "last".
    */
  def pivotLastValue(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(max_by(col("value"), col("ts")))
      .orderBy("day")
  }

  private val pivotLastValueOracle =
    """SELECT date_trunc('day', ts) AS day,
      |  arg_max(value, ts) FILTER (WHERE event_type = 'click') AS click,
      |  arg_max(value, ts) FILTER (WHERE event_type = 'error') AS error,
      |  arg_max(value, ts) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  arg_max(value, ts) FILTER (WHERE event_type = 'signup') AS signup,
      |  arg_max(value, ts) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** String normalization (P9: upper/trim) + group count. */
  def symbolNorm(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(upper(trim(col("event_type"))).as("symbol"))
      .groupBy("symbol").agg(count(lit(1)).as("n"))
      .orderBy("symbol")

  private val symbolNormOracle =
    """SELECT upper(trim(event_type)) AS symbol, count(*) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** JSON wire-format round trip (P1-P3, P11): events → tick JSON payload
    * (to_json) → parse back (from_json) → epoch-ms → timestamp. The oracle
    * computes the identity directly; matching proves the codec.
    */
  def parseTicks(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TickParse
    val payload = TickParse.toJsonPayload(
      events(s, dir).select(
        col("event_type").as("symbol"),
        col("value").as("price"),
        unix_millis(col("ts")).as("event_time_ms")))
    TickParse.parseRaw(payload)
      .orderBy("event_time_ms", "symbol", "price")
  }

  private val parseTicksOracle =
    """SELECT event_type AS symbol, value AS price,
      |       epoch_ms(ts) AS event_time_ms,
      |       epoch_ms(epoch_ms(ts)) AS event_time
      |FROM events
      |ORDER BY event_time_ms, symbol, price""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("features_sliding",
      "flagship: sliding 1h/15m per-type windowed tick features",
      featuresSliding, Some(featuresSlidingOracle)),
    QueryDef("features_tumbling",
      "tumbling 1-day windowed tick features",
      featuresTumbling, Some(featuresTumblingOracle)),
    QueryDef("volatility_true",
      "stddev of intra-window per-tick log returns",
      volatilityTrue, Some(volatilityTrueOracle)),
    QueryDef("kpi",
      "serving KPIs: total rows + mean value",
      kpi, Some(kpiOracle)),
    QueryDef("recent_slice",
      "time-range + IN-list filter slice, ordered",
      recentSlice, Some(recentSliceOracle)),
    QueryDef("pivot_daily",
      "per-day counts pivoted wide by event_type",
      pivotDaily, Some(pivotDailyOracle)),
    QueryDef("pivot_last_value",
      "last-by-time value per day per type, wide (dashboard reshape)",
      pivotLastValue, Some(pivotLastValueOracle)),
    QueryDef("symbol_norm",
      "upper/trim normalization + group count",
      symbolNorm, Some(symbolNormOracle)),
    QueryDef("parse_ticks",
      "to_json/from_json tick codec round trip",
      parseTicks, Some(parseTicksOracle)))
}
