package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics beyond the builtin aggregates. */
object Stats {

  /** (multiplier, increment) per Count-Min row — fixed public 31-bit
    * constants for the Carter–Wegman universal hash
    * `((a·(k mod p) + b) mod p) mod w` with p = 2³¹−1: every
    * intermediate fits 2⁶² so the arithmetic is overflow-free under
    * ANSI mode in Spark AND replays verbatim in the SQL oracle — no
    * wraparound semantics needed anywhere.
    */
  val CmsRows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1588635695L, 1117695901L),
    (784588716L, 998244353L),
    (1223106847L, 103658078L))

  /** p = 2³¹ − 1 (prime) — the universal-hash modulus. */
  val CmsP: Long = 2147483647L

  /** Bucket for one Carter–Wegman row. The key is first FOLDED as
    * `key xor (key >> 31)` (arithmetic shift — identical two's-
    * complement semantics in Spark and DuckDB, so the oracle replays
    * it verbatim): the mod-p reduction alone would make any two keys
    * congruent mod 2³¹−1 collide STRUCTURALLY in all d rows (no
    * min-protection), which matters exactly for 64-bit id spaces
    * (xxhash64-derived keys). The fold mixes the high 33 bits into the
    * low word before the reduction, so congruent-mod-p longs land in
    * independent buckets; the pairwise-independence bound then holds
    * over the folded 64-bit universe rather than only below p.
    */
  private def cmsBucket(key: org.apache.spark.sql.Column, a: Long, b: Long,
      w: Int): org.apache.spark.sql.Column = {
    val folded = key.bitwiseXOR(shiftright(key, 31))
    pmod(pmod(pmod(folded, lit(CmsP)) * a + b, lit(CmsP)), lit(w.toLong))
  }

  /** COUNT-MIN SKETCH cells (Cormode & Muthukrishnan 2005): d=4 hash
    * rows × `w` buckets of summed counts — the point-frequency
    * complement to the Misra-Gries top-k sketch: estimate(k) =
    * min_j cell(j, h_j(k)) is never below the true count and
    * overshoots by at most εN (ε ≈ e/w) with high probability.
    *
    * Deterministic BY CONSTRUCTION, unlike library CMS impls: buckets
    * come from the fixed-constant Carter–Wegman hash ([[CmsRows]]),
    * so the cell frame is engine-reproducible and ORACLE-ABLE, not
    * just spec-bounded.
    *
    * Scale shape: a 4-way projection explode then ONE map-side-combined
    * aggregation to ≤ 4·w cells — the reduced frame is O(w) no matter
    * the input size, and cells are additive, so per-partition partials
    * (or per-day sketches) merge by cell-wise sum — the same
    * mergeability contract as the HLL rollup.
    */
  def countMinCells(df: DataFrame, keyCol: String, w: Int = 256): DataFrame = {
    require(w >= 2, s"w must be >= 2, got $w")
    val k = col(keyCol).cast("long")
    val buckets = array(CmsRows.zipWithIndex.map { case ((a, b), _) =>
      cmsBucket(k, a, b, w)
    }: _*)
    df.select(posexplode(buckets).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for `probes` (any frame with `keyCol`)
    * against a [[countMinCells]] frame: min over the d row lookups,
    * coalescing an untouched cell to 0. The cell frame is O(w) and
    * broadcasts; probes never shuffle.
    */
  def countMinEstimate(cells: DataFrame, probes: DataFrame,
      keyCol: String, w: Int = 256): DataFrame = {
    val k = col(keyCol).cast("long")
    val withBuckets = probes.select(col(keyCol),
      posexplode(array(CmsRows.map { case (a, b) =>
        cmsBucket(k, a, b, w)
      }: _*)).as(Seq("j", "bucket")))
    withBuckets
      .join(broadcast(cells), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** 2-D SKYLINE (Pareto frontier): the rows NOT DOMINATED under
    * (minimize `minimizeCol`, maximize `maximizeCol`) — r is dominated
    * iff some other row is ≤ on the minimized axis AND ≥ on the
    * maximized one, with at least one strict. Equal-on-both rows do not
    * dominate each other (both stay on the frontier).
    *
    * Distributed shape (the 2-D case admits a sort-based plan; a naive
    * skyline is an all-pairs anti-join): ONE keyed aggregation reduces
    * to per-value groups (`__gmax` = best maximized value per minimized
    * value), the strictly-cheaper running best comes from
    * [[graft.ops.Ranks.withGlobalPrefixMax]] over the REDUCED frame
    * (range shuffle + O(P) offsets — never a one-task window), and rows
    * join back keyed on the minimized value. Dominance is then two
    * comparisons: beaten by a strictly-cheaper group's best, or by a
    * same-cost strictly-better row.
    *
    * `maximizeCol` must be integral (cast to long for the prefix max)
    * and NON-NULL on every row: a null is incomparable under dominance,
    * so the operator refuses it (the prefix-max pass fails fast naming
    * the contract) rather than silently ranking it — filter or impute
    * nulls before calling.
    */
  def skyline2d(df: DataFrame, minimizeCol: String,
      maximizeCol: String): DataFrame = {
    val g = df.groupBy(col(minimizeCol).as("__sk_min"))
      .agg(max(col(maximizeCol).cast("long")).as("__gmax"))
    val pm = graft.ops.Ranks.withGlobalPrefixMax(
      g, Seq(col("__sk_min")), col("__gmax"), "__prevmax")
    df.join(pm, col(minimizeCol) === col("__sk_min"))
      .where(!(col("__prevmax") >= col(maximizeCol).cast("long") ||
        col("__gmax") > col(maximizeCol).cast("long")))
      .drop("__sk_min", "__gmax", "__prevmax")
  }

  /** Exact linear-interpolated quantiles per key (the percentile_cont
    * definition): for probability p over n sorted values, position
    * pos = p·(n−1) (0-based), result = v⌊pos⌋ + frac·(v⌊pos⌋₊₁ − v⌊pos⌋).
    *
    * Distributed shape: ONE per-key sort (the grouped two-pass range
    * shuffle — see the inline note; eager at call time — at scale
    * this is the documented exact-quantile cost; `approx_percentile`
    * is the sketch path when the sort is unaffordable), then only the
    * 2·|ps| boundary ROWS per key are touched: the target ranks
    * broadcast back (one row per (key, p) — O(keys·ps), tiny) and meet
    * the ranked data on a (key, rank) equijoin, so no second pass ever
    * rescans the values. High-cardinality keys would swap the
    * broadcast for a shuffle join; the plan is otherwise unchanged.
    *
    * Determinism: interpolation is a fixed-order double formula over
    * exactly-selected elements (no sums), identical in any engine;
    * rounded to 6 dp. Output: key, p, q — ordered by nothing (caller
    * sorts).
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0,1]: $ps")
    // the per-key rank via the two-pass range shuffle, NOT
    // `row_number() OVER (PARTITION BY key)`: a handful of keys over a
    // big table means corpus-scale window partitions, each through ONE
    // task. The grouped rank emits the per-key count too, so the
    // `count() OVER (PARTITION BY key)` second window goes with it.
    // Ties (equal values) may swap ranks across runs; the selected
    // boundary VALUES are identical, so q is deterministic either way.
    // deliberately NOT pinned: the grouped rank's regime check + pass 1
    // re-scan the source, but a 2-column pushdown parquet scan is
    // cheaper than a checkpoint write + reads (measured a wash at
    // sf0.1; the pin is for EXPENSIVE upstreams — perplexityBuckets)
    val ranked = graft.ops.Ranks.withGroupedRowNumber(
      df.select(col(keyCol), col(valCol))
        .filter(col(valCol).isNotNull),
      Seq(keyCol), Seq(col(valCol)), "__rn", totalOut = Some("__n"))
    val psArr = array(ps.map(lit): _*)
    val targets = ranked.select(col(keyCol), col("__n")).distinct()
      .select(col(keyCol), col("__n"), explode(psArr).as("p"))
      .withColumn("__pos", col("p") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__f", col("__pos") - floor(col("__pos")))
      // the key is RENAMED on this side: both frames descend from
      // `ranked`, so an equality between same-named columns would hit
      // Spark's self-join auto-disambiguation (it logs "trivially true
      // equals predicate" and guesses); the rename makes the join
      // condition unambiguous by construction
      .select(col(keyCol).as("__k"), col("p"), col("__lo"), col("__f"))
    val hits = ranked.join(broadcast(targets),
        col(keyCol) === col("__k") &&
          (col("__rn") === col("__lo") + 1 ||
            col("__rn") === col("__lo") + 2))
      .drop("__k")
      .groupBy(col(keyCol), col("p"), col("__f"))
      .agg(
        max(when(col("__rn") === col("__lo") + 1, col(valCol))).as("__vlo"),
        max(when(col("__rn") === col("__lo") + 2, col(valCol))).as("__vhi"))
    hits.select(col(keyCol), col("p"),
      round(col("__vlo") +
        col("__f") * (coalesce(col("__vhi"), col("__vlo")) - col("__vlo")),
        6).as("q"))
  }
}
