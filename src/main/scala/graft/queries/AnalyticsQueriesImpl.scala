package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Analytics
import graft.model.Tables

/** Market-analytics queries over the events stream table (beyond the
  * indicator family): VWAP, max drawdown, cross-series correlation,
  * gap-fill resampling, MAD anomaly fences. All decimal-exact where a
  * sum crosses rows — see [[graft.extra.Analytics]].
  */
object AnalyticsQueriesImpl {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Synthetic deterministic trade size: the events table has no volume
    * column, so both engines derive the SAME qty from the row identity
    * (1..100). This keeps the VWAP weights non-trivial and exactly
    * reproducible in the oracle.
    */
  private def withQty(df: DataFrame): DataFrame =
    df.withColumn("qty", (col("event_id") % 100 + 1).cast("long"))

  // ---- vwap_daily ---------------------------------------------------

  def vwapDaily(s: SparkSession, dir: String): DataFrame =
    Analytics.vwap(withQty(events(s, dir)), "event_type", "ts",
        "value", "qty")
      .orderBy("event_type", "day")

  private val vwapOracle =
    """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, value,
      |  event_id % 100 + 1 AS qty FROM events)
      |SELECT event_type, day,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))
      |                 * CAST(qty AS DECIMAL(12,0))) AS DOUBLE)
      |        / CAST(sum(CAST(qty AS DECIMAL(18,0))) AS DOUBLE), 6) AS vwap,
      |  CAST(sum(qty) AS BIGINT) AS total_qty,
      |  count(*) AS n_trades
      |FROM e GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---- max_drawdown -------------------------------------------------

  def maxDrawdown(s: SparkSession, dir: String): DataFrame =
    Analytics.maxDrawdown(events(s, dir), "event_type", "ts", "value")
      .orderBy("event_type")

  private val drawdownOracle =
    """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT event_type, day, px,
      |  max(px) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM d0)
      |SELECT event_type,
      |  max(CASE WHEN peak > 0
      |      THEN round((peak - px) / peak, 6) END) AS max_drawdown,
      |  max(round(peak - px, 6)) AS max_abs_drawdown,
      |  count(*) AS n_days
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- pair_corr ----------------------------------------------------

  def pairCorr(s: SparkSession, dir: String): DataFrame =
    Analytics.pairCorrelation(events(s, dir), "event_type", "ts",
        "value", bucket = "hour")
      .orderBy("k1", "k2")

  private val pairCorrOracle =
    """WITH srs AS (SELECT event_type AS k, date_trunc('hour', ts) AS bucket,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT a.k AS k1, b.k AS k2,
      |  CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(a.px AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(b.px AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(round(a.px*b.px, 12) AS DECIMAL(30,12)))
      |       AS DOUBLE) AS sxy,
      |  CAST(sum(CAST(round(a.px*a.px, 12) AS DECIMAL(30,12)))
      |       AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(round(b.px*b.px, 12) AS DECIMAL(30,12)))
      |       AS DOUBLE) AS syy
      |  FROM srs a JOIN srs b ON a.bucket = b.bucket AND a.k < b.k
      |  GROUP BY 1, 2)
      |SELECT k1, k2, CAST(n AS BIGINT) AS n_buckets,
      |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |    THEN round((n*sxy - sx*sy)
      |               / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
      |  END AS corr
      |FROM m ORDER BY 1, 2""".stripMargin

  // ---- gap_fill -----------------------------------------------------

  def gapFill(s: SparkSession, dir: String): DataFrame =
    Analytics.gapFill(events(s, dir)
        .filter(col("event_type") === "purchase"),
        "event_type", "ts", "value", "event_id", stepUnit = "hour")
      .orderBy("event_type", "bucket")

  private val gapFillOracle =
    """WITH src AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
      |  value, row_number() OVER (
      |    PARTITION BY event_type, date_trunc('hour', ts)
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase'),
      |o AS (SELECT event_type, bucket, value FROM src WHERE rn = 1),
      |span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
      |  FROM o GROUP BY 1),
      |grid AS (SELECT event_type,
      |  unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      |  FROM span),
      |j AS (SELECT g.event_type, g.bucket, o.value
      |  FROM grid g LEFT JOIN o
      |    ON g.event_type = o.event_type AND g.bucket = o.bucket)
      |SELECT event_type, bucket,
      |  last_value(value IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      |  (value IS NULL) AS is_gap
      |FROM j ORDER BY 1, 2""".stripMargin

  // ---- anomaly_mad --------------------------------------------------

  def anomalyMad(s: SparkSession, dir: String): DataFrame =
    Analytics.anomalyMad(events(s, dir), "event_type", "value", k = 5.0)
      .orderBy("event_type")

  private val anomalyOracle =
    """WITH m AS (SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, m.med,
      |  round(abs(e.value - m.med), 6) AS dev
      |  FROM events e JOIN m USING (event_type)),
      |s AS (SELECT event_type, any_value(med) AS med,
      |  round(quantile_cont(dev, 0.5), 6) AS mad, count(*) AS n
      |  FROM d GROUP BY 1)
      |SELECT s.event_type, s.med, s.mad, s.n,
      |  CAST(sum(CASE WHEN d.dev > 5.0 * s.mad THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_anomalies
      |FROM d JOIN s USING (event_type)
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin

  /** Sketch-median variant (approx_percentile): estimates are
    * engine-specific, so rows-only — the exact twin `anomaly_mad` is
    * the oracle-verified form, and `AnalyticsSpec` bounds the gap.
    */
  def anomalyMadApprox(s: SparkSession, dir: String): DataFrame =
    graft.extra.Analytics.anomalyMadApprox(events(s, dir), "event_type",
        "value", k = 5.0)
      .orderBy("event_type")

  // ---- ab_ttest -----------------------------------------------------

  /** Welch t-test per event_type between the deterministic variants
    * user_id % 2 = 0 (A) and 1 (B) — decimal-exact moments, one pass.
    */
  def abTTest(s: SparkSession, dir: String): DataFrame =
    Analytics.welchTTest(
      events(s, dir).withColumn("variant", (col("user_id") % 2).cast("int")),
      "event_type", "variant", "value")
      .orderBy("event_type")

  private val abOracle =
    """WITH m AS (SELECT event_type,
      |  count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
      |  CAST(sum(CASE WHEN user_id % 2 = 0
      |    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sa,
      |  CAST(sum(CASE WHEN user_id % 2 = 0
      |    THEN CAST(round(value*value, 12) AS DECIMAL(30,12)) END)
      |    AS DOUBLE) AS qa,
      |  count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n_b,
      |  CAST(sum(CASE WHEN user_id % 2 = 1
      |    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sb,
      |  CAST(sum(CASE WHEN user_id % 2 = 1
      |    THEN CAST(round(value*value, 12) AS DECIMAL(30,12)) END)
      |    AS DOUBLE) AS qb
      |  FROM events GROUP BY 1),
      |r AS (SELECT event_type, n_a,
      |  round(sa / CAST(n_a AS DOUBLE), 6) AS mean_a,
      |  round((qa - sa*sa / CAST(n_a AS DOUBLE))
      |        / (CAST(n_a AS DOUBLE) - 1.0), 6) AS var_a,
      |  n_b,
      |  round(sb / CAST(n_b AS DOUBLE), 6) AS mean_b,
      |  round((qb - sb*sb / CAST(n_b AS DOUBLE))
      |        / (CAST(n_b AS DOUBLE) - 1.0), 6) AS var_b
      |  FROM m)
      |SELECT event_type, n_a, mean_a, var_a, n_b, mean_b, var_b,
      |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (var_a > 0 OR var_b > 0)
      |    THEN round((mean_a - mean_b)
      |      / sqrt(var_a / CAST(n_a AS DOUBLE)
      |             + var_b / CAST(n_b AS DOUBLE)), 6) END AS t_stat
      |FROM r ORDER BY event_type""".stripMargin

  // ---- trend_ols ----------------------------------------------------

  /** OLS slope/intercept of the daily mean value against the day index
    * per event_type (decimal-exact moments over the daily roll-up).
    */
  def trendOls(s: SparkSession, dir: String): DataFrame =
    Analytics.olsTrend(events(s, dir), "event_type", "ts", "value")
      .orderBy("event_type")

  private val trendOracle =
    """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events GROUP BY 1, 2),
      |x AS (SELECT event_type, px,
      |  datediff('day', min(day) OVER (PARTITION BY event_type), day)
      |    AS xi FROM d0),
      |m AS (SELECT event_type, count(*) AS n_days,
      |  CAST(sum(xi) AS DOUBLE) AS sx,
      |  CAST(sum(xi * xi) AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(px AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(round(xi * px, 6) AS DECIMAL(30,6))) AS DOUBLE)
      |    AS sxy
      |  FROM x GROUP BY 1)
      |SELECT event_type, n_days,
      |  CASE WHEN n_days >= 2
      |        AND CAST(n_days AS DOUBLE)*sxx - sx*sx > 0
      |    THEN round((CAST(n_days AS DOUBLE)*sxy - sx*sy)
      |      / (CAST(n_days AS DOUBLE)*sxx - sx*sx), 6) END AS slope,
      |  CASE WHEN n_days >= 2
      |        AND CAST(n_days AS DOUBLE)*sxx - sx*sx > 0
      |    THEN round((sy - ((CAST(n_days AS DOUBLE)*sxy - sx*sy)
      |      / (CAST(n_days AS DOUBLE)*sxx - sx*sx)) * sx)
      |      / CAST(n_days AS DOUBLE), 6) END AS intercept
      |FROM m ORDER BY event_type""".stripMargin

  // ---- rolling_corr -------------------------------------------------

  /** 24-hour rolling correlation for two event-type pairs (pairs-
    * trading style signal; the pair id comes from data columns so the
    * window stays keyed).
    */
  def rollingCorr(s: SparkSession, dir: String): DataFrame =
    Analytics.rollingCorrelation(events(s, dir), "event_type", "ts",
        "value", Seq(("click", "view"), ("view", "purchase")),
        windowN = 24)
      .orderBy("pair", "bucket")

  private val rollingCorrOracle =
    """WITH pairs(ka, kb) AS (VALUES ('click', 'view'),
      |  ('view', 'purchase')),
      |srs AS (SELECT event_type AS k, date_trunc('hour', ts)
      |    AS bucket,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events
      |  WHERE event_type IN ('click', 'view', 'purchase')
      |  GROUP BY 1, 2),
      |j AS (SELECT p.ka, p.kb, a.bucket, a.px AS x, b.px AS y,
      |    p.ka || '|' || p.kb AS pair
      |  FROM pairs p
      |  JOIN srs a ON a.k = p.ka
      |  JOIN srs b ON b.k = p.kb AND b.bucket = a.bucket),
      |f AS (SELECT ka, kb, pair, bucket, x, y,
      |  CAST(count(*) OVER w AS DOUBLE) AS n,
      |  CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
      |  CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
      |  CAST(sum(CAST(round(x*y, 12) AS DECIMAL(30,12))) OVER w
      |       AS DOUBLE) AS sxy,
      |  CAST(sum(CAST(round(x*x, 12) AS DECIMAL(30,12))) OVER w
      |       AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(round(y*y, 12) AS DECIMAL(30,12))) OVER w
      |       AS DOUBLE) AS syy
      |  FROM j
      |  WINDOW w AS (PARTITION BY ka, kb ORDER BY bucket
      |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT pair, bucket, x, y, CAST(n AS BIGINT) AS n_in_frame,
      |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |    THEN round((n*sxy - sx*sy)
      |      / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END AS corr
      |FROM f ORDER BY pair, bucket""".stripMargin

  // ---- autocorr_daily -----------------------------------------------

  /** Lag-1 autocorrelation of the daily mean series per event_type. */
  def autocorrDaily(s: SparkSession, dir: String): DataFrame =
    Analytics.autocorrelation(events(s, dir), "event_type", "ts",
        "value", lagDays = 1)
      .orderBy("event_type")

  private val autocorrOracle =
    """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |        / count(value), 6) AS px
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT event_type, px,
      |  lag(px) OVER (PARTITION BY event_type ORDER BY day) AS py
      |  FROM d0),
      |m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(px AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(py AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(round(px*py, 12) AS DECIMAL(30,12))) AS DOUBLE)
      |    AS sxy,
      |  CAST(sum(CAST(round(px*px, 12) AS DECIMAL(30,12))) AS DOUBLE)
      |    AS sxx,
      |  CAST(sum(CAST(round(py*py, 12) AS DECIMAL(30,12))) AS DOUBLE)
      |    AS syy
      |  FROM p WHERE py IS NOT NULL GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
      |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |    THEN round((n*sxy - sx*sy)
      |      / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END AS autocorr
      |FROM m ORDER BY event_type""".stripMargin

  // ---- event_transitions --------------------------------------------

  /** First-order Markov transition counts between consecutive event
    * types per user (ties inside a timestamp break by event_id): the
    * path-analysis primitive. One keyed window + one count aggregation.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  private val transitionsOracle =
    """WITH t AS (SELECT user_id, event_type,
      |  lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS next_type, count(*) AS n
      |FROM t WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- cep_pattern --------------------------------------------------

  /** Strict-contiguous CEP pattern detection (the SQL-2016
    * MATCH_RECOGNIZE `PATTERN (A B C)` core): all click→view→purchase
    * runs at consecutive per-user positions completing within 48
    * hours (the events table is a sparse 30-day stream, ~10 h between
    * a user's events, so a CEP window is measured in hours) — see [[graft.extra.Cep.matchContiguous]] (one keyed
    * window, overlaps emit, exact-millis duration). The oracle replays
    * the identical lead chain.
    */
  def cepPattern(s: SparkSession, dir: String): DataFrame =
    graft.extra.Cep.matchContiguous(events(s, dir), "user_id", "ts",
        "event_type", Seq("click", "view", "purchase"),
        withinMs = 172800000L, tieCol = "event_id")
      .orderBy("user_id", "match_start")

  private val cepPatternOracle =
    """WITH t AS (SELECT user_id, ts, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(ts, 2) OVER w AS end_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, ts AS match_start, end_ts AS match_end,
      |  epoch_ms(end_ts) - epoch_ms(ts) AS duration_ms
      |FROM t
      |WHERE event_type = 'click' AND t1 = 'view' AND t2 = 'purchase'
      |  AND end_ts IS NOT NULL
      |  AND epoch_ms(end_ts) - epoch_ms(ts) <= 172800000
      |ORDER BY user_id, match_start""".stripMargin

  // ---- type_entropy -------------------------------------------------

  def typeEntropy(s: SparkSession, dir: String): DataFrame =
    Analytics.categoryEntropy(events(s, dir), "user_id", "event_type")
      .orderBy("user_id")

  private val entropyOracle =
    """WITH c AS (SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT user_id, c,
      |  sum(c) OVER (PARTITION BY user_id) AS n FROM c)
      |SELECT user_id, CAST(any_value(n) AS BIGINT) AS n_events,
      |  count(*) AS n_cats,
      |  round(CAST(sum(CAST(round(
      |    -(CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
      |      * log2(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 9)
      |    AS DECIMAL(30,12))) AS DOUBLE), 6) AS entropy
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- value_histogram ----------------------------------------------

  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    Analytics.histogram(events(s, dir), "event_type", "value", bins = 10)
      .orderBy("event_type", "bin")

  private val histogramOracle =
    """WITH ext AS (SELECT event_type, min(value) AS mn, max(value) AS mx
      |  FROM events GROUP BY 1),
      |b AS (SELECT e.event_type,
      |  CASE WHEN x.mx = x.mn THEN 0
      |    ELSE least(CAST(floor((e.value - x.mn)
      |      / ((x.mx - x.mn) / 10.0)) AS BIGINT), 9) END AS bin,
      |  x.mn, x.mx
      |  FROM events e JOIN ext x USING (event_type))
      |SELECT event_type, bin,
      |  round(any_value(mn) + bin * ((any_value(mx) - any_value(mn))
      |    / 10.0), 6) AS lo,
      |  round(any_value(mn) + (bin + 1) * ((any_value(mx) - any_value(mn))
      |    / 10.0), 6) AS hi,
      |  count(*) AS cnt
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- funnel_stages ------------------------------------------------

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * stage N only via events STRICTLY AFTER their stage N−1 entry
    * (min-ts chaining — three keyed aggs, each joining the previous
    * tiny per-user frame back into a filtered scan). Latency is the
    * DECIMAL-exact mean of the per-user microsecond gaps.
    */
  def funnelStages(s: SparkSession, dir: String): DataFrame =
    Analytics.funnel(events(s, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  private val funnelOracle =
    """WITH v AS (SELECT user_id, min(ts) AS s1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS s2, any_value(v.s1) AS s1k
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.s1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS s3, any_value(c.s2) AS s2k
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.s2 GROUP BY 1)
      |SELECT * FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users,
      |    NULL::DOUBLE AS avg_step_seconds FROM v
      |  UNION ALL
      |  SELECT '2_click', count(*),
      |    round(CAST(sum(CAST(epoch_us(s2) - epoch_us(s1k)
      |      AS DECIMAL(20,0))) AS DOUBLE) / count(*) / 1000000.0, 6)
      |  FROM c
      |  UNION ALL
      |  SELECT '3_purchase', count(*),
      |    round(CAST(sum(CAST(epoch_us(s3) - epoch_us(s2k)
      |      AS DECIMAL(20,0))) AS DOUBLE) / count(*) / 1000000.0, 6)
      |  FROM p
      |) ORDER BY stage""".stripMargin

  // ---- cohort_retention ---------------------------------------------

  /** Cohort retention triangle: users grouped by first-seen day, active
    * user counts per (cohort, day offset). Two keyed aggs (first-seen
    * per user; distinct active days) + one equijoin on user_id.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    Analytics.cohortRetention(events(s, dir), "user_id", "ts")
      .orderBy("cohort", "day_offset")

  private val cohortOracle =
    """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort
      |  FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT f.cohort,
      |  CAST(datediff('day', f.cohort, a.day) AS INT) AS day_offset,
      |  count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("funnel_stages",
      "ordered view->click->purchase funnel with exact mean latencies",
      funnelStages, Some(funnelOracle)),
    QueryDef("cohort_retention",
      "first-seen cohort x day-offset active-user triangle",
      cohortRetention, Some(cohortOracle)),
    QueryDef("cep_pattern",
      "strict-contiguous CEP pattern (MATCH_RECOGNIZE core) per user",
      cepPattern, Some(cepPatternOracle)),
    QueryDef("event_transitions",
      "first-order Markov transition counts between event types",
      eventTransitions, Some(transitionsOracle)),
    QueryDef("ab_ttest",
      "Welch two-sample t-test per type (decimal-exact moments, 1 pass)",
      abTTest, Some(abOracle)),
    QueryDef("trend_ols",
      "OLS slope/intercept of daily means vs day index per type",
      trendOls, Some(trendOracle)),
    QueryDef("autocorr_daily",
      "lag-1 autocorrelation of the daily series (exact moments)",
      autocorrDaily, Some(autocorrOracle)),
    QueryDef("rolling_corr",
      "24h rolling correlation between two hourly series (frame sums)",
      rollingCorr, Some(rollingCorrOracle)),
    QueryDef("vwap_daily",
      "volume-weighted average price per type/day (decimal-exact)",
      vwapDaily, Some(vwapOracle)),
    QueryDef("max_drawdown",
      "max peak-to-trough drawdown per type over the daily series",
      maxDrawdown, Some(drawdownOracle)),
    QueryDef("pair_corr",
      "pairwise Pearson correlation of hourly series, exact moment sums",
      pairCorr, Some(pairCorrOracle)),
    QueryDef("gap_fill",
      "hourly LOCF resampling: grid + carry-forward, gaps flagged",
      gapFill, Some(gapFillOracle)),
    QueryDef("anomaly_mad",
      "median/MAD robust anomaly fences per type (exact medians)",
      anomalyMad, Some(anomalyOracle)),
    QueryDef("anomaly_mad_approx",
      "single-pass sketch-median MAD fences (engine estimate; no oracle)",
      anomalyMadApprox, None),
    QueryDef("type_entropy",
      "per-user Shannon entropy of event types (label diversity)",
      typeEntropy, Some(entropyOracle)),
    QueryDef("value_histogram",
      "per-type equi-width 10-bin histogram (broadcast extents)",
      valueHistogram, Some(histogramOracle)))
}
