package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Technical-indicator operators over keyed time series — the batch
  * analytics a market-data platform layers on its tick store (the
  * reference's serving UI shows raw windows only; these are the standard
  * indicator family computed Spark-native): Bollinger bands, RSI, EWMA.
  *
  * All three share a first stage: a per-(key, day) DECIMAL-exact price
  * summary (one shuffle, map-side partial agg). The indicator stage then
  * runs per key over the DAILY series — thousands of rows per key at
  * most, never per-tick — so the expensive raw scan is aggregated away
  * before any window/fold state exists.
  *
  * Determinism: every frame sum runs in DECIMAL (exact, order-
  * independent); doubles appear only in final single-expression
  * formulas with a fixed operation order, then round(…, 6). Results are
  * identical on any partitioning and bit-reproducible in the SQL oracle.
  *
  * Scale: the daily roll-up is the scan-dominant stage (linear, one
  * shuffle on (key, day)). The window stage shuffles once on key; its
  * frame state is O(window) rows of 3 numeric columns. EWMA's fold
  * state is the per-key day count (bounded: years → low thousands) —
  * documented as the collect-then-fold tier, NOT applicable per-tick.
  */
object Indicators {

  /** Per-(key, day) mean price, DECIMAL-exact: sum in DECIMAL(18,6)
    * (order-independent), one double division, round 6. Output columns:
    * key, `day`, `px`, `n_obs`.
    */
  def dailyMean(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(
        round(sum(col(valCol).cast(DecimalType(18, 6))).cast("double") /
          count(col(valCol)), 6).as("px"),
        count(col(valCol)).as("n_obs"))

  /** Bollinger bands: W-day rolling mean ± k·stddev of the daily mean
    * price, per key. Sample stddev from exact DECIMAL frame sums of px
    * and px² (px is a 6-dp double, so px² rounded to 12 dp is exact in
    * DECIMAL(30,12)); the variance formula runs once in double with a
    * fixed op order. Warmup rows (fewer than 2 days in frame) emit NULL
    * bands rather than a 0/0.
    *
    * Output: key, day, px, ma (rolling mean), sd, upper, lower, n_days.
    */
  def bollinger(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, windowDays: Int = 7, k: Double = 2.0): DataFrame = {
    val daily = dailyMean(df, keyCol, tsCol, valCol)
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-(windowDays - 1), 0)
    val sm = sum(col("px").cast(DecimalType(18, 6))).over(w).cast("double")
    val sq = sum(round(col("px") * col("px"), 12).cast(DecimalType(30, 12)))
      .over(w).cast("double")
    val n = count(col("px")).over(w).cast("double")
    val ma = round(sm / n, 6)
    val sd = when(n >= 2,
      round(sqrt(greatest((sq - sm * sm / n) / (n - lit(1.0)), lit(0.0))), 6))
    daily
      .withColumn("ma", ma)
      .withColumn("sd", sd)
      .withColumn("upper", round(col("ma") + lit(k) * col("sd"), 6))
      .withColumn("lower", round(col("ma") - lit(k) * col("sd"), 6))
      .withColumn("n_days", n.cast("long"))
      .drop("n_obs")
  }

  /** RSI (simple-moving-average form): per key, daily diffs split into
    * gains/losses, W-day frame averages (DECIMAL-exact sums), then
    * RSI = 100 − 100/(1 + gain/loss). Zero-loss frames pin to 100
    * (standard convention); frames with fewer than W diffs emit NULL
    * (indicator warmup).
    *
    * Output: key, day, px, rsi.
    */
  def rsi(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      windowDays: Int = 14): DataFrame = {
    val daily = dailyMean(df, keyCol, tsCol, valCol)
    val ord = Window.partitionBy(keyCol).orderBy("day")
    val frame = ord.rowsBetween(-(windowDays - 1), 0)
    val diff = round(col("px") - lag("px", 1).over(ord), 6)
    val withDiff = daily
      .withColumn("__gain",
        when(diff > 0, diff).otherwise(lit(0.0))
          .cast(DecimalType(18, 6)))
      .withColumn("__loss",
        when(diff < 0, -diff).otherwise(lit(0.0))
          .cast(DecimalType(18, 6)))
      // NULL diff (first day per key) must not count toward the frame
      .withColumn("__has", when(diff.isNotNull, lit(1)).otherwise(lit(0)))
    val gSum = sum(when(col("__has") === 1, col("__gain"))).over(frame)
      .cast("double")
    val lSum = sum(when(col("__has") === 1, col("__loss"))).over(frame)
      .cast("double")
    val nDiffs = sum(col("__has")).over(frame)
    val rsiCol = when(nDiffs < windowDays, lit(null).cast("double"))
      .when(lSum === 0.0, lit(100.0))
      .otherwise(round(lit(100.0) - lit(100.0) / (lit(1.0) + gSum / lSum), 6))
    withDiff.withColumn("rsi", rsiCol)
      .select(col(keyCol), col("day"), col("px"), col("rsi"))
  }

  /** EWMA of the daily mean price per key:
    * ewma₁ = px₁; ewmaᵢ = α·pxᵢ + (1−α)·ewmaᵢ₋₁ over day order.
    *
    * The recurrence is inherently sequential, so it runs as a per-key
    * ordered FOLD over the daily series: collect the (day, px) structs,
    * sort once, `aggregate` builds the running value array, posexplode
    * back to rows. State per key = day count (bounded — years of daily
    * bars is a few thousand rows of two numerics), NOT tick count: the
    * per-tick scan was already reduced by [[dailyMean]]'s shuffle. This
    * is the documented collect-then-fold tier (same as sequence
    * packing's per-shard pass) — a window frame cannot express the
    * recurrence because each output feeds the next.
    *
    * Determinism: px is a 6-dp double; the fold multiplies with literal
    * α/(1−α) in a fixed order and rounds each step to 6 dp, so the
    * series is bit-reproducible in any engine evaluating the same
    * recurrence (the oracle's recursive CTE).
    *
    * Output: key, day, px, ewma.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val daily = dailyMean(df, keyCol, tsCol, valCol)
    val series = daily.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("px"))))
        .as("__s"))
    val folded = series.withColumn("__e",
      aggregate(col("__s"),
        // accumulator: running ewma array, parallel to __s
        expr("CAST(array() AS ARRAY<DOUBLE>)"),
        (acc, x) => concat(acc, array(
          when(size(acc) === 0, x.getField("px"))
            .otherwise(round(
              lit(alpha) * x.getField("px") +
                lit(1.0 - alpha) * element_at(acc, -1), 6)))))
    )
    folded
      .select(col(keyCol), posexplode(arrays_zip(col("__s"), col("__e"))))
      .select(col(keyCol), col("col.__s.day").as("day"),
        col("col.__s.px").as("px"), col("col.__e").as("ewma"))
  }

  /** Two-sided CUSUM drift detector (Page 1954) over the per-(key,
    * day) daily mean series — level-shift monitoring for a market
    * feed, and the standard drift check a training-data pipeline runs
    * on per-domain quality series:
    *
    *   z_t  = (px_t − mean) / std        (standardized vs the key's
    *                                      own full series, 6-dp)
    *   S⁺_t = max(0, S⁺_{t−1} + z_t − slack)
    *   S⁻_t = max(0, S⁻_{t−1} − z_t − slack)   (each rounded 6-dp)
    *   alarm_t = S⁺_t > threshold ∨ S⁻_t > threshold
    *
    * Determinism discipline (the EWMA playbook): series mean/std come
    * from DECIMAL-exact sums (px is a 6-dp double so px² rounded to
    * 12 dp is exact in DECIMAL(30,12)); mean and std are rounded to
    * 6 dp BEFORE standardization, z is rounded to 6 dp, and each
    * recurrence step re-rounds — every intermediate both engines
    * compare is a 6-dp value, so the recursive-CTE oracle replays the
    * fold bit-identically. Degenerate series (n < 2 or zero/negative
    * variance) standardize to z = 0 — flat, alarm-free.
    *
    * Scale: the raw scan aggregates away into the daily roll-up (one
    * keyed shuffle); stats are one more keyed agg joined back
    * (broadcast-sized: one row per key); the fold state is the
    * per-key day count — the documented collect-then-fold tier,
    * bounded (years → low thousands), NEVER per-tick.
    *
    * Output: key, day, px, z, cusum_pos, cusum_neg, alarm.
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, slack: Double = 0.5,
      threshold: Double = 4.0): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val daily = dailyMean(df, keyCol, tsCol, valCol)
    val stats = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("px").cast(DecimalType(18, 6))).cast("double").as("__sm"),
      sum(round(col("px") * col("px"), 12).cast(DecimalType(30, 12)))
        .cast("double").as("__sq"))
    val mean = round(col("__sm") / col("__n"), 6)
    val variance = (col("__sq") - col("__sm") * col("__sm") / col("__n")) /
      (col("__n") - 1)
    val z = when(col("__n") < 2 || variance <= 0, lit(0.0))
      .otherwise(round(
        (col("px") - mean) / round(sqrt(variance), 6), 6))
    val series = daily.join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("day"), col("px"), z.as("__z"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col("day"), col("px"), col("__z")))).as("__s"))
    val stepType = "struct<sp:double,sn:double>"
    def last(acc: Column, field: String): Column =
      when(size(acc) === 0, lit(0.0))
        .otherwise(element_at(acc, -1).getField(field))
    val folded = series.withColumn("__c",
      aggregate(col("__s"),
        expr(s"CAST(array() AS ARRAY<$stepType>)"),
        (acc, x) => concat(acc, array(
          struct(
            round(greatest(lit(0.0),
              last(acc, "sp") + x.getField("__z") - lit(slack)), 6),
            round(greatest(lit(0.0),
              last(acc, "sn") - x.getField("__z") - lit(slack)), 6))
            .cast(stepType)))))
    folded
      .select(col(keyCol), posexplode(arrays_zip(col("__s"), col("__c"))))
      .select(col(keyCol),
        col("col.__s.day").as("day"),
        col("col.__s.px").as("px"),
        col("col.__s.__z").as("z"),
        col("col.__c.sp").as("cusum_pos"),
        col("col.__c.sn").as("cusum_neg"),
        (col("col.__c.sp") > threshold || col("col.__c.sn") > threshold)
          .as("alarm"))
  }
}
