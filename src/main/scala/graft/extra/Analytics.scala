package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Portfolio/market analytics over keyed time series — the batch layer a
  * market-data platform runs on its tick store beyond the indicator
  * family ([[Indicators]]): VWAP, max drawdown, cross-series correlation,
  * gap-fill resampling, and robust (MAD) anomaly detection. The
  * reference serves raw windows only (spark_streaming.py:55-118); these
  * are the standard downstream analytics, built Spark-native.
  *
  * Shared design rules (same as [[Indicators]]):
  *   - Exactness: every cross-row sum runs in DECIMAL (order-independent,
  *     partitioning-independent); doubles appear only in final
  *     fixed-order formulas, then `round(…, 6)`. Results hash-match the
  *     SQL oracle bit-for-bit.
  *   - Scale: the per-tick scan is reduced by ONE keyed shuffle into a
  *     bounded per-(key, bucket) frame (days or hours per key — thousands
  *     of rows, never tick count) before any window/join state exists.
  */
object Analytics {

  /** Volume-weighted average price per (key, day):
    * `sum(price·qty) / sum(qty)`, price·qty summed in DECIMAL (price at
    * 6 dp × integer qty keeps scale 6 — exact), one double division,
    * round 6. One shuffle with map-side partial aggregation; linear in
    * the scan, output bounded by keys × days.
    *
    * Output: key, `day`, `vwap`, `total_qty`, `n_trades`.
    */
  def vwap(df: DataFrame, keyCol: String, tsCol: String,
      priceCol: String, qtyCol: String): DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(
        round(
          sum(col(priceCol).cast(DecimalType(18, 6)) *
            col(qtyCol).cast(DecimalType(12, 0))).cast("double") /
            sum(col(qtyCol).cast(DecimalType(18, 0))).cast("double"),
          6).as("vwap"),
        sum(col(qtyCol)).cast("long").as("total_qty"),
        count(lit(1)).as("n_trades"))

  /** Maximum drawdown per key over the DAILY mean-price series: the
    * largest peak-to-trough decline, relative (`(peak−px)/peak`, only
    * where the running peak is positive) and absolute (`peak−px`,
    * always defined). The per-tick scan collapses through
    * [[Indicators.dailyMean]] first (one shuffle); the cumulative-max
    * window then runs per key over the bounded daily series, and a
    * final keyed agg reduces to one row per key.
    *
    * Output: key, `max_drawdown` (relative, NULL if the peak was never
    * positive), `max_abs_drawdown`, `n_days`.
    */
  def maxDrawdown(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = Indicators.dailyMean(df, keyCol, tsCol, valCol)
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col("px")).over(w)
    daily
      .withColumn("__rel",
        when(peak > 0, round((peak - col("px")) / peak, 6)))
      .withColumn("__abs", round(peak - col("px"), 6))
      .groupBy(col(keyCol))
      .agg(
        max(col("__rel")).as("max_drawdown"),
        max(col("__abs")).as("max_abs_drawdown"),
        count(lit(1)).as("n_days"))
  }

  /** Pearson correlation between every PAIR of keys' bucketed mean
    * series, from DECIMAL-exact moment sums (NOT the streaming `corr`
    * aggregate, whose double accumulation is partitioning-dependent):
    * per (key, bucket) mean → self-equijoin on bucket with `k1 < k2` →
    * per-pair exact sums n, Σx, Σy, Σxy, Σx², Σy² → one fixed-order
    * double formula, round 6.
    *
    * Scale: stage 1 is the scan-dominant keyed shuffle; the self-join is
    * an equijoin on bucket whose output is `buckets × K²/2` rows — K is
    * the number of distinct keys (instruments), so for the typical
    * thousands-of-symbols universe this is a bounded frame, and the join
    * NEVER touches per-tick data. Pairs with fewer than `minPoints`
    * shared buckets or a zero-variance side emit NULL.
    *
    * Output: `k1`, `k2`, `n_buckets`, `corr`.
    */
  def pairCorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, bucket: String = "hour",
      minPoints: Int = 2): DataFrame = {
    val series = df
      .groupBy(col(keyCol).as("k"),
        date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(round(sum(col(valCol).cast(DecimalType(18, 6))).cast("double") /
        count(col(valCol)), 6).as("px"))
    val a = series.select(col("k").as("k1"), col("bucket"),
      col("px").as("x"))
    val b = series.select(col("k").as("k2"), col("bucket"),
      col("px").as("y"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 6))
    val prod = (u: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column) =>
      round(u * v, 12).cast(DecimalType(30, 12))
    val moments = a.join(b, "bucket").filter(col("k1") < col("k2"))
      .groupBy("k1", "k2")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(prod(col("x"), col("y"))).cast("double").as("sxy"),
        sum(prod(col("x"), col("x"))).cast("double").as("sxx"),
        sum(prod(col("y"), col("y"))).cast("double").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    moments
      .withColumn("corr",
        when(col("n") >= minPoints && vx > 0 && vy > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt(vx * vy), 6)))
      .select(col("k1"), col("k2"), col("n").cast("long").as("n_buckets"),
        col("corr"))
  }

  /** Gap-fill resampling: per key, a fixed `stepUnit` grid from the
    * key's first to last observed bucket, last-observation-carried-
    * forward. Three bounded stages: (1) one keyed shuffle reduces ticks
    * to the last observation per (key, bucket) — deterministic winner by
    * `max_by` on (ts, tieCol); (2) per-key min/max bucket generates the
    * grid via `sequence` + explode (grid size = span/step, never tick
    * count); (3) left join grid⋈observed on (key, bucket) and a per-key
    * carry-forward window over the bounded grid.
    *
    * Output: key, `bucket`, `filled` (carried value), `is_gap` (true on
    * grid rows with no observation).
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, stepUnit: String = "hour"): DataFrame = {
    val obs = df
      .groupBy(col(keyCol).as("k"),
        date_trunc(stepUnit, col(tsCol)).as("bucket"))
      .agg(max_by(col(valCol), struct(col(tsCol), col(tieCol)))
        .as("value"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"),
        expr(s"interval 1 $stepUnit"))).as("bucket"))
    val joined = grid.join(obs, Seq("k", "bucket"), "left")
    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("value").isNull)
      .select(col("k").as(keyCol), col("bucket"), col("filled"),
        col("is_gap"))
  }

  /** Shannon entropy of a categorical column per key — the label-
    * diversity signal (a user whose events are all one type carries no
    * surprise; uniform across T types carries log₂T bits). Two keyed
    * aggregations: (key, category) counts, then per-key totals via a
    * keyed window over the tiny count frame and a DECIMAL sum of the
    * 12-dp-rounded per-category terms −p·log₂p (order-independent,
    * engine-identical; the count frame is keys × categories, never row
    * count).
    *
    * Output: key, `n_events`, `n_cats`, `entropy` (bits, 6 dp).
    */
  def categoryEntropy(df: DataFrame, keyCol: String,
      catCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(keyCol)
    val p = col("c").cast("double") / col("n").cast("double")
    // 9-dp term rounding: wide enough slack (double precision ~1e-16
    // against a 0.5e-9 boundary) that even ulp-level log2 differences
    // between engines cannot flip a rounding, unlike 12 dp (see the
    // pagerank oracle history)
    val term = round(-p * log2(p), 9).cast(DecimalType(30, 12))
    counts
      .withColumn("n", sum(col("c")).over(w))
      .groupBy(col(keyCol))
      .agg(
        first(col("n")).as("n_events"),
        count(lit(1)).as("n_cats"),
        round(sum(term).cast("double"), 6).as("entropy"))
  }

  /** Equi-width histogram per key: `bins` buckets between the key's own
    * min and max (the top edge closes into the last bin). Two keyed
    * aggregations over the scan — min/max per key broadcast back, then
    * the bucket index is a pure projection and the final count is one
    * shuffle with map-side combine. A constant-value key lands entirely
    * in bin 0 (width 0 guard).
    *
    * Output: key, `bin`, `lo`, `hi` (bin edges, 6 dp), `cnt`.
    */
  def histogram(df: DataFrame, keyCol: String, valCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val ext = df.groupBy(col(keyCol))
      .agg(min(col(valCol)).as("__mn"), max(col(valCol)).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val rawBin = floor((col(valCol) - col("__mn")) / width).cast("long")
    val bin = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(rawBin, lit(bins - 1L)))
    df.join(broadcast(ext), keyCol)
      .withColumn("bin", bin)
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(first(col("__mn")) +
          col("bin") * ((first(col("__mx")) - first(col("__mn"))) /
            lit(bins.toDouble)), 6).as("lo"),
        round(first(col("__mn")) +
          (col("bin") + 1) * ((first(col("__mx")) - first(col("__mn"))) /
            lit(bins.toDouble)), 6).as("hi"))
      .select(col(keyCol), col("bin"), col("lo"), col("hi"), col("cnt"))
  }

  /** Rolling correlation between PAIRS of keys' bucketed mean series —
    * the pairs-trading signal: per shared bucket, Pearson over the last
    * `windowN` aligned points, from DECIMAL-exact frame sums (the
    * [[Indicators.bollinger]] pattern applied to five moments). Each
    * pair's two series join on bucket (keyed equijoins over the bounded
    * per-(key, bucket) roll-up), and the rolling window partitions on
    * the pair's DATA columns (ka, kb) — non-foldable, so the plan stays
    * a keyed window even for one pair (a literal pair id would be
    * constant-folded out of the partition spec, collapsing to a global
    * single-partition window). Each pair's frame is span-bounded
    * (buckets, never ticks), so a thousand-pair portfolio parallelizes
    * across partitions. Warmup rows (< `minPoints` in frame) and
    * zero-variance frames emit NULL.
    *
    * Output: `pair` ("ka|kb"), `bucket`, `x`, `y`, `n_in_frame`,
    * `corr`.
    */
  def rollingCorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, pairs: Seq[(String, String)],
      bucket: String = "hour", windowN: Int = 24,
      minPoints: Int = 2): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val series = df
      .filter(col(keyCol).isin(keys: _*))
      .groupBy(col(keyCol).as("k"),
        date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(round(sum(col(valCol).cast(DecimalType(18, 6))).cast("double") /
        count(col(valCol)), 6).as("px"))
    val pairsDf = pairs.toDF("ka", "kb")
    val joined = pairsDf
      .join(series.select(col("k").as("ka"), col("bucket"),
        col("px").as("x")), "ka")
      .join(series.select(col("k").as("kb"), col("bucket"),
        col("px").as("y")), Seq("kb", "bucket"))
      .withColumn("pair", concat(col("ka"), lit("|"), col("kb")))
    val w = Window.partitionBy("ka", "kb").orderBy("bucket")
      .rowsBetween(-(windowN - 1), 0)
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 6))
    val prod = (u: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column) =>
      round(u * v, 12).cast(DecimalType(30, 12))
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(dec(col("x"))).over(w).cast("double")
    val sy = sum(dec(col("y"))).over(w).cast("double")
    val sxy = sum(prod(col("x"), col("y"))).over(w).cast("double")
    val sxx = sum(prod(col("x"), col("x"))).over(w).cast("double")
    val syy = sum(prod(col("y"), col("y"))).over(w).cast("double")
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    joined
      .withColumn("n_in_frame", n.cast("long"))
      .withColumn("corr",
        when(n >= minPoints && vx > 0 && vy > 0,
          round((n * sxy - sx * sy) / sqrt(vx * vy), 6)))
      .select(col("pair"), col("bucket"), col("x"), col("y"),
        col("n_in_frame"), col("corr"))
  }

  /** Lag-k autocorrelation of the DAILY mean series per key (k in
    * OBSERVED days — the lag is positional over the ordered daily
    * frame, robust to calendar gaps). Pearson over the (pxₜ, pxₜ₋ₖ)
    * pairs from DECIMAL-exact moment sums, like [[pairCorrelation]]:
    * one keyed lag window over the bounded daily roll-up, one keyed
    * aggregation. NULL when fewer than `minPoints` pairs or a
    * zero-variance side.
    *
    * Output: key, `n_pairs`, `autocorr`.
    */
  def autocorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, lagDays: Int = 1, minPoints: Int = 2): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    val daily = Indicators.dailyMean(df, keyCol, tsCol, valCol)
    val w = Window.partitionBy(keyCol).orderBy("day")
    val pairs = daily
      .withColumn("__py", lag("px", lagDays).over(w))
      .filter(col("__py").isNotNull)
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 6))
    val prod = (u: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column) =>
      round(u * v, 12).cast(DecimalType(30, 12))
    val m = pairs.groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("px"))).cast("double").as("sx"),
        sum(dec(col("__py"))).cast("double").as("sy"),
        sum(prod(col("px"), col("__py"))).cast("double").as("sxy"),
        sum(prod(col("px"), col("px"))).cast("double").as("sxx"),
        sum(prod(col("__py"), col("__py"))).cast("double").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    m.withColumn("autocorr",
        when(col("n") >= minPoints && vx > 0 && vy > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt(vx * vy), 6)))
      .select(col(keyCol), col("n").cast("long").as("n_pairs"),
        col("autocorr"))
  }

  /** Welch's two-sample t-statistic per key between the rows where
    * `groupCol` is 0 (variant A) and 1 (variant B) — the A/B-test
    * primitive. ONE pass: a single keyed aggregation computes both
    * variants' DECIMAL-exact moment sums via conditional aggregates;
    * means/variances round to 6 dp and the t formula runs once in
    * fixed-order double. NULL t when either side has < 2 rows or both
    * variances are 0.
    *
    * Output: key, `n_a`, `mean_a`, `var_a`, `n_b`, `mean_b`, `var_b`,
    * `t_stat`.
    */
  def welchTTest(df: DataFrame, keyCol: String, groupCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol)
    val dec = v.cast(DecimalType(18, 6))
    val dec2 = round(v * v, 12).cast(DecimalType(30, 12))
    def side(tag: Int, c: org.apache.spark.sql.Column) =
      sum(when(col(groupCol) === tag, c))
    val agged = df.groupBy(col(keyCol))
      .agg(
        count(when(col(groupCol) === 0, 1)).as("n_a"),
        side(0, dec).cast("double").as("sa"),
        side(0, dec2).cast("double").as("qa"),
        count(when(col(groupCol) === 1, 1)).as("n_b"),
        side(1, dec).cast("double").as("sb"),
        side(1, dec2).cast("double").as("qb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val meanA = round(col("sa") / na, 6)
    val meanB = round(col("sb") / nb, 6)
    val varA = round((col("qa") - col("sa") * col("sa") / na) /
      (na - 1.0), 6)
    val varB = round((col("qb") - col("sb") * col("sb") / nb) /
      (nb - 1.0), 6)
    agged
      .withColumn("mean_a", meanA).withColumn("var_a", varA)
      .withColumn("mean_b", meanB).withColumn("var_b", varB)
      .withColumn("t_stat",
        when(col("n_a") >= 2 && col("n_b") >= 2 &&
          (col("var_a") > 0 || col("var_b") > 0),
          round((col("mean_a") - col("mean_b")) /
            sqrt(col("var_a") / na + col("var_b") / nb), 6)))
      .select(col(keyCol), col("n_a"), col("mean_a"), col("var_a"),
        col("n_b"), col("mean_b"), col("var_b"), col("t_stat"))
  }

  /** OLS trend over the DAILY mean series per key: slope and intercept
    * of px against the day index (days since the key's first day).
    * The raw scan collapses through [[Indicators.dailyMean]] first; the
    * regression runs over DECIMAL-exact moments of the bounded daily
    * frame (x is an exact integer, px a 6-dp double, so x·px at 6 dp
    * is exact). Slope/intercept are fixed-order double formulas
    * rounded to 6 dp; NULL when fewer than 2 days or zero x-variance.
    *
    * Output: key, `n_days`, `slope` (px per day), `intercept`
    * (px at the first day).
    */
  def olsTrend(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = Indicators.dailyMean(df, keyCol, tsCol, valCol)
    val w = Window.partitionBy(keyCol)
    val withX = daily
      .withColumn("__x", datediff(col("day"), min(col("day")).over(w)))
    val decY = col("px").cast(DecimalType(18, 6))
    val decXY = round(col("__x") * col("px"), 6).cast(DecimalType(30, 6))
    val m = withX.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("__x")).cast("double").as("sx"),
        sum(col("__x") * col("__x")).cast("double").as("sxx"),
        sum(decY).cast("double").as("sy"),
        sum(decXY).cast("double").as("sxy"))
    val n = col("n_days").cast("double")
    val denom = n * col("sxx") - col("sx") * col("sx")
    val slopeRaw = (n * col("sxy") - col("sx") * col("sy")) / denom
    m.withColumn("slope",
        when(col("n_days") >= 2 && denom > 0, round(slopeRaw, 6)))
      .withColumn("intercept",
        when(col("n_days") >= 2 && denom > 0,
          round((col("sy") - slopeRaw * col("sx")) / n, 6)))
      .select(col(keyCol), col("n_days"), col("slope"), col("intercept"))
  }

  /** Ordered conversion funnel over an event stream: a user reaches
    * stage i only via a `stages(i)`-typed event STRICTLY AFTER their
    * stage i−1 entry time (min-ts chaining). Each stage is one keyed
    * aggregation over a filtered scan joined with the previous stage's
    * tiny per-user frame (one row per surviving user — broadcastable at
    * any realistic funnel width). Latencies are DECIMAL-exact means of
    * the per-user microsecond gaps.
    *
    * Output: `stage` (`"<i>_<name>"`, 1-based), `n_users`,
    * `avg_step_seconds` (NULL for the first stage), ordered by stage.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel needs at least two stages")
    val first0 = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val frames = stages.tail.scanLeft(first0) { (prev, stName) =>
      df.filter(col(typeCol) === stName)
        .join(prev.select(col(userCol), col("t").as("pt")), userCol)
        .filter(col(tsCol) > col("pt"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("t"), first(col("pt")).as("pt"))
    }
    val lat = round(sum((unix_micros(col("t")) - unix_micros(col("pt")))
      .cast(DecimalType(20, 0))).cast("double") /
      count(lit(1)) / 1000000.0, 6)
    // Order by the NUMERIC stage index, not the string label: with 10+
    // stages lexicographic label order breaks ("10_x" < "2_y"). The
    // label keeps its unpadded display form; the index column is
    // dropped after the sort (a projection preserves the sort order).
    frames.zipWithIndex.map { case (f, i) =>
      val latency = if (i == 0) lit(null).cast("double") else lat
      f.agg(count(lit(1)).as("n_users"), latency.as("avg_step_seconds"))
        .select(lit(i + 1).as("__stage_idx"),
          lit(s"${i + 1}_${stages(i)}").as("stage"),
          col("n_users"), col("avg_step_seconds"))
    }.reduce(_.unionByName(_)).orderBy("__stage_idx").drop("__stage_idx")
  }

  /** Cohort retention triangle: users grouped by first-seen day,
    * distinct-active-user counts per (cohort, day offset). Two keyed
    * aggregations + one equijoin on the user.
    */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first0 = df.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    val active = df.select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    active.join(first0, userCol)
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Robust anomaly detection per key: median/MAD fences. Three keyed
    * passes over the input — exact median per key; deviations
    * `round(|v − med|, 6)` against the ROUNDED median (so the fence
    * predicate is engine-identical); exact MAD = median of deviations;
    * then a count of rows beyond `k·MAD`. The per-key stats frames are
    * tiny and broadcast into the row-level joins, so no pass shuffles
    * the fact table more than its own keyed agg.
    *
    * Exact medians are the correctness contract here; at 100 TB the
    * single-pass `approx_percentile` variant is the documented scale
    * path (same shape, sketch agg instead of sort-based percentile).
    *
    * Output: key, `med`, `mad`, `n`, `n_anomalies`.
    */
  def anomalyMad(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 5.0): DataFrame =
    anomalyMadImpl(df, keyCol, valCol, k,
      c => s"percentile($c, 0.5)")

  /** The single-pass-sketch twin of [[anomalyMad]] — the 100 TB path:
    * identical shape (all-broadcast stat lookups), but medians come
    * from `approx_percentile` (KLL-style mergeable sketch, one pass, no
    * per-key sort). The estimate is engine-specific, so the registered
    * query is rows-only; `AnalyticsSpec` asserts agreement with the
    * exact twin within the sketch's accuracy bound.
    */
  def anomalyMadApprox(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 5.0, accuracy: Int = 10000): DataFrame =
    anomalyMadImpl(df, keyCol, valCol, k,
      c => s"approx_percentile($c, 0.5, $accuracy)")

  private def anomalyMadImpl(df: DataFrame, keyCol: String,
      valCol: String, k: Double,
      percentileSql: String => String): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(round(expr(percentileSql(valCol)), 6).as("med"))
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__dev", round(abs(col(valCol) - col("med")), 6))
    val stats = dev.groupBy(col(keyCol))
      .agg(
        first(col("med")).as("med"),
        round(expr(percentileSql("__dev")), 6).as("mad"),
        count(lit(1)).as("n"))
    dev.select(col(keyCol), col("__dev"))
      .join(broadcast(stats), keyCol)
      .groupBy(col(keyCol))
      .agg(
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        first(col("n")).as("n"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_anomalies"))
  }
}
