package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Relational coverage beyond the reference's surface (SURVEY.md §2.5
  * notes the reference has no joins/limits/set-ops): star-schema joins,
  * grouped aggregation, top-k per group — the workhorse shapes a 100 TB
  * analytics engine must plan well.
  *
  * Scale notes:
  *   - dimension joins (region/nation/customer/supplier/part) are
  *     explicitly `broadcast()` — at 100 TB the fact tables shuffle for
  *     nothing if Catalyst misestimates; dims here are KB-MB sized at any
  *     realistic SF.
  *   - money sums run in DECIMAL(18,2): exact, order-independent,
  *     and identical across engines (doubles would drift with partial-agg
  *     order).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  /** TPC-H Q1-like pricing summary over lineitem. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        round(sum(dec("l_quantity")).cast("double") / count(col("l_quantity")), 6)
          .as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(col("l_extendedprice")), 6)
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |        / count(l_quantity), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |        / count(l_extendedprice), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Star join: revenue by nation — lineitem ⋈ supplier ⋈ nation ⋈ region.
    * All three dimension sides broadcast (no shuffle of the fact table
    * except the final group-by).
    */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val revenueByNationOracle =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Customer order stats: orders ⋈ customer (broadcast dim) with
    * per-customer aggregates, filtered to high spenders.
    */
  def customerOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("total_spent"),
        max(col("o_orderdate")).as("last_order"))
      .filter(col("n_orders") >= 5)
      .orderBy("c_custkey")
  }

  private val customerOrdersOracle =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  max(o_orderdate) AS last_order
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3
      |HAVING count(*) >= 5
      |ORDER BY 1""".stripMargin

  /** Brand revenue: lineitem ⋈ part (broadcast dim) — covers the part
    * table and the classic fact-⋈-product-dim rollup.
    */
  def brandRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
          .cast("double").as("revenue"),
        round(sum(dec("p_retailprice")).cast("double") /
          count(lit(1)), 6).as("avg_retail"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  private val brandRevenueOracle =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |        / count(*), 6) AS avg_retail,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Top-k per group via ranked window: 3 highest-revenue line items per
    * return flag. The canonical "rank then filter" shape; Spark executes
    * as a single sort per partition key (no global sort).
    */
  def topKPerGroup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("l_returnflag", "rk", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_returnflag", "rk")
  }

  private val topKOracle =
    """SELECT l_returnflag, rk, l_orderkey, l_linenumber, l_extendedprice
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |         row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem)
      |WHERE rk <= 3
      |ORDER BY l_returnflag, rk""".stripMargin

  /** Set ops + distinct: order keys appearing in lineitem but not orders
    * would be referential breakage — count both directions (anti joins).
    */
  def orphanCheck(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey").as("k")).distinct()
    val o = t(s, dir, "orders").select(col("o_orderkey").as("k")).distinct()
    val liOnly = li.join(o, Seq("k"), "left_anti").agg(count(lit(1)).as("n"))
      .withColumn("side", lit("lineitem_only"))
    val oOnly = o.join(li, Seq("k"), "left_anti").agg(count(lit(1)).as("n"))
      .withColumn("side", lit("orders_only"))
    liOnly.unionByName(oOnly).select("side", "n").orderBy("side")
  }

  private val orphanCheckOracle =
    """SELECT * FROM (
      |  SELECT 'lineitem_only' AS side, count(*) AS n FROM (
      |    SELECT DISTINCT l_orderkey FROM lineitem
      |    EXCEPT SELECT DISTINCT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'orders_only' AS side, count(*) AS n FROM (
      |    SELECT DISTINCT o_orderkey FROM orders
      |    EXCEPT SELECT DISTINCT l_orderkey FROM lineitem))
      |ORDER BY side""".stripMargin

  /** Exact distinct counting (shuffle-dedup) per group. */
  /** COUNT-MIN SKETCH point frequencies vs truth (see
    * [[graft.extra.Stats.countMinCells]]): every user's estimated event
    * count from a d=4 × w=64 sketch next to the exact count — est is
    * never below truth and the overcount column makes the ε-error
    * visible. Fixed LCG hash constants make the sketch a pure function
    * of the data, so — unusually for a sketch — the query is fully
    * ORACLE-EXACT, not rows-only: DuckDB replays every cell with the
    * identical mod-p arithmetic.
    */
  def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val cells = graft.extra.Stats.countMinCells(e, "user_id", w = 64)
    val truth = e.groupBy("user_id").agg(count(lit(1)).as("true_n"))
    graft.extra.Stats.countMinEstimate(cells,
        truth.select("user_id"), "user_id", w = 64)
      .join(truth, "user_id")
      .select(col("user_id"), col("est"), col("true_n"),
        (col("est") - col("true_n")).as("overcount"))
      .orderBy("user_id")
  }

  private val cmsFreqOracle =
    """WITH r(j, a, b) AS (SELECT * FROM (VALUES
      |  (0, 1103515245, 12345),
      |  (1, 1588635695, 1117695901),
      |  (2, 784588716, 998244353),
      |  (3, 1223106847, 103658078)) v(j, a, b)),
      |cells AS (SELECT j,
      |    (a * ((((xor(user_id, user_id >> 31)) % 2147483647)
      |      + 2147483647) % 2147483647) + b) % 2147483647 % 64 AS bucket,
      |    count(*) AS c
      |  FROM events CROSS JOIN r GROUP BY 1, 2),
      |truth AS (SELECT user_id, count(*) AS true_n
      |  FROM events GROUP BY 1),
      |est AS (SELECT t.user_id,
      |    CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est
      |  FROM truth t CROSS JOIN r
      |  LEFT JOIN cells c ON c.j = r.j AND c.bucket =
      |    (r.a * ((((xor(t.user_id, t.user_id >> 31)) % 2147483647)
      |      + 2147483647) % 2147483647) + r.b) % 2147483647 % 64
      |  GROUP BY 1)
      |SELECT e.user_id, e.est, t.true_n, e.est - t.true_n AS overcount
      |FROM est e JOIN truth t USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** 2-D skyline over part: the price/size Pareto frontier (cheapest
    * part at every size level no cheaper-and-bigger alternative beats) —
    * see [[graft.extra.Stats.skyline2d]] for the sort-based distributed
    * shape (keyed reduce + O(P)-offset prefix max, never all-pairs).
    * The oracle states the same reduction with a plain window over the
    * reduced per-price frame.
    */
  def skylineParts(s: SparkSession, dir: String): DataFrame =
    graft.extra.Stats.skyline2d(t(s, dir, "part"),
        "p_retailprice", "p_size")
      .select("p_partkey", "p_brand", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_partkey")

  private val skylineOracle =
    """WITH g AS (SELECT p_retailprice AS price, max(p_size) AS gmax
      |  FROM part GROUP BY 1),
      |pm AS (SELECT price, gmax, max(gmax) OVER (ORDER BY price
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM g)
      |SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
      |FROM part p JOIN pm ON p.p_retailprice = pm.price
      |WHERE NOT (coalesce(pm.prevmax, -2147483648) >= p.p_size
      |           OR pm.gmax > p.p_size)
      |ORDER BY p_retailprice, p_partkey""".stripMargin

  def distinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  private val distinctUsersOracle =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Approximate distinct (HLL++, X3). The sketch estimate is
    * engine-specific, so this is deliberately oracle-less (driver
    * records a rows-only check); the companion exact query above is the
    * hash-matched ground truth.
    */
  def approxDistinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
      .orderBy("event_type")

  /** Mergeable distinct-count sketches (X3's "persistable sketch" tier):
    * per-day HLL sketches built in one pass, then UNIONED per type — the
    * 100 TB pattern where daily sketches are materialized once and any
    * rollup window is a cheap sketch merge, never a re-scan. Estimates
    * are engine-specific → rows-only check (exact twin: distinct_users).
    */
  def hllSketchUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
        count(lit(1)).as("n_daily_sketches"))
      .orderBy("event_type")

  /** Statistical aggregates per group: spread, exact median (continuous
    * interpolation — same definition as DuckDB quantile_cont), and
    * Pearson correlation. All rounded to 6 dp (stddev/corr accumulate
    * co-moments whose low bits are algorithm-dependent across engines).
    */
  def statsByType(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(stddev_samp(col("value")), 6).as("stddev_value"),
        round(var_samp(col("value")), 6).as("var_value"),
        round(expr("percentile(value, 0.5)"), 6).as("median_value"),
        round(corr(col("value"), col("user_id").cast("double")), 6)
          .as("corr_value_user"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  private val statsByTypeOracle =
    """SELECT event_type,
      |  round(stddev_samp(value), 6) AS stddev_value,
      |  round(var_samp(value), 6) AS var_value,
      |  round(quantile_cont(value, 0.5), 6) AS median_value,
      |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user,
      |  min(value) AS min_value,
      |  max(value) AS max_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Rollup with grouping_id: per (event_type, day) counts plus
    * per-type and grand totals.
    */
  def rollupDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .rollup(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first,
        col("day").asc_nulls_first)

  private val rollupDailyOracle =
    """SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
      |       GROUPING(event_type, date_trunc('day', ts)) AS gid
      |FROM events
      |GROUP BY ROLLUP (event_type, date_trunc('day', ts))
      |ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** CUBE over (event_type, day): all four grouping combinations —
    * the cross-tab complement of [[rollupDaily]]'s hierarchy. Same
    * scale shape as any grouped agg (one shuffle; Spark expands the
    * grouping sets BEFORE the exchange, so partial aggregation still
    * combines map-side); `grouping_id` (leftmost column = MSB, the
    * Spark/Postgres/DuckDB-shared convention) disambiguates NULL
    * group values from NULL-as-aggregated and makes ordering total.
    */
  def cubeDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .cube(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first,
        col("day").asc_nulls_first)

  private val cubeDailyOracle =
    """SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
      |       GROUPING(event_type, date_trunc('day', ts)) AS gid
      |FROM events
      |GROUP BY CUBE (event_type, date_trunc('day', ts))
      |ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** GROUPING SETS revenue: per-priority, per-year, and grand-total
    * order revenue in ONE pass — the non-hierarchical set list neither
    * ROLLUP nor CUBE expresses (no (priority, year) cell). SQL-authored
    * (grouping sets are a SQL-surface feature, like [[sqlAboveAvg]]);
    * decimal-exact revenue, total (gid, keys NULLS FIRST) order.
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, year(o_orderdate) AS yr,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  grouping_id(o_orderpriority, year(o_orderdate)) AS gid
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST, yr NULLS FIRST""".stripMargin)
  }

  private val groupingSetsRevenueOracle =
    """SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  GROUPING(o_orderpriority, year(o_orderdate)) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)), ())
      |ORDER BY gid, o_orderpriority NULLS FIRST, yr NULLS FIRST""".stripMargin

  /** Frame-based window aggregation: per-customer running order total
    * and sequence number (ROWS UNBOUNDED PRECEDING — the cumulative
    * ledger shape). Decimal-exact running sums.
    */
  def runningTotals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_total",
        sum(dec("o_totalprice")).over(wRun).cast("double"))
      .select("o_custkey", "order_seq", "o_orderkey", "o_orderdate",
        "running_total")
      .orderBy("o_custkey", "order_seq")
  }

  private val runningTotalsOracle =
    """SELECT o_custkey,
      |  row_number() OVER w AS order_seq,
      |  o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** Time-based RANGE frame window: 7-day trailing revenue per customer
    * — every order row carries the sum of that customer's order totals
    * with `o_orderdate` in the trailing 7-day interval (RANGE BETWEEN
    * INTERVAL 7 DAYS PRECEDING AND CURRENT ROW over the event time, NOT
    * a row-count frame: same-day peers always aggregate together, and
    * gaps in the date sequence shrink the frame). Decimal-exact sum.
    *
    * Scale: the window shuffles once on o_custkey; the range frame is
    * evaluated with a sliding aggregate over each partition's sorted
    * run — no per-row rescan.
    */
  def trailingRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").selectExpr(
      "o_custkey", "o_orderkey", "o_orderdate",
      """CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |AS DOUBLE) AS trailing_7d_revenue""".stripMargin)
      .orderBy("o_custkey", "o_orderkey")

  private val trailingRevenueOracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
      |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
      |  AS DOUBLE) AS trailing_7d_revenue
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ntile bucketing: customer account-balance deciles with per-decile
    * decimal-exact stats. Uses [[graft.ops.Ranks.withNtile]] — the
    * range-shuffle global rank — instead of `ntile().over(Window
    * .orderBy(...))`, whose empty PARTITION BY funnels the whole table
    * through a single task (WindowExec warns; fatal at 100 TB).
    */
  def custkeyDeciles(s: SparkSession, dir: String): DataFrame = {
    graft.ops.Ranks.withNtile(
      t(s, dir, "customer").select("c_acctbal", "c_custkey"),
      Seq(col("c_acctbal"), col("c_custkey")), 10, "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy("decile")
  }

  private val custkeyDecilesOracle =
    """SELECT decile, count(*) AS n, min(c_acctbal) AS min_bal,
      |       max(c_acctbal) AS max_bal
      |FROM (SELECT c_acctbal,
      |        ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      |      FROM customer)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Calendar extraction rollup: orders by year/quarter/month with
    * decimal revenue — the date-dimension shape.
    */
  def ordersByMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))
      .orderBy("yr", "qtr", "mth")

  private val ordersByMonthOracle =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |       CAST(month(o_orderdate) AS INTEGER) AS mth,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Set operations: event types active in both the first and the last
    * observed week (intersect), and only in the first (except).
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val wk1 = ev.filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      .select("event_type")
    val wk4 = ev.filter(col("ts") >= lit("2024-01-22 00:00:00").cast("timestamp"))
      .select("event_type")
    wk1.intersect(wk4).withColumn("op", lit("both"))
      .unionByName(wk1.except(wk4).withColumn("op", lit("first_only")))
      .select("op", "event_type")
      .orderBy("op", "event_type")
  }

  private val setOpsOracle =
    """SELECT 'both' AS op, event_type FROM (
      |  SELECT event_type FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      |  INTERSECT
      |  SELECT event_type FROM events WHERE ts >= TIMESTAMP '2024-01-22 00:00:00')
      |UNION ALL
      |SELECT 'first_only' AS op, event_type FROM (
      |  SELECT event_type FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      |  EXCEPT
      |  SELECT event_type FROM events WHERE ts >= TIMESTAMP '2024-01-22 00:00:00')
      |ORDER BY op, event_type""".stripMargin

  /** Semi join (EXISTS): customers with at least one filed order. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val semiJoinOracle =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** SQL surface parity: a correlated scalar subquery authored as SQL
    * (Catalyst decorrelates to joins). Comparison is decimal-exact on
    * both engines (price*count vs 2*sum), so no float boundary flakes.
    */
  def sqlAboveAvg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_v o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |      * (SELECT count(*) FROM orders_v i
        |         WHERE i.o_custkey = o.o_custkey)
        |      > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |             FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val sqlAboveAvgOracle =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2))
      |      * (SELECT count(*) FROM orders i
      |         WHERE i.o_custkey = o.o_custkey)
      |      > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |             FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Exact interpolated quantiles (percentile_cont semantics) of event
    * value per event_type, computed distributively: one per-key sort +
    * boundary-row selection — see [[graft.extra.Stats.exactQuantiles]].
    */
  def valueQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.extra.Stats.exactQuantiles(t(s, dir, "events"), "event_type",
        "value", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      .orderBy("event_type", "p")

  private val valueQuantilesOracle =
    """WITH r AS (SELECT event_type, value,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events WHERE value IS NOT NULL),
      |t AS (SELECT event_type, n,
      |  CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS p
      |  FROM (SELECT DISTINCT event_type, n FROM r)),
      |t2 AS (SELECT event_type, p, CAST(floor(p*(n-1)) AS BIGINT) AS lo,
      |  p*(n-1) - floor(p*(n-1)) AS f FROM t),
      |j AS (SELECT r.event_type, t2.p, t2.f,
      |  max(CASE WHEN r.rn = t2.lo + 1 THEN r.value END) AS vlo,
      |  max(CASE WHEN r.rn = t2.lo + 2 THEN r.value END) AS vhi
      |  FROM r JOIN t2 ON r.event_type = t2.event_type
      |   AND (r.rn = t2.lo + 1 OR r.rn = t2.lo + 2)
      |  GROUP BY 1, 2, 3)
      |SELECT event_type, p,
      |  round(vlo + f*(coalesce(vhi, vlo) - vlo), 6) AS q
      |FROM j ORDER BY event_type, p""".stripMargin

  /** SCD Type-2 dimension build: collapse each user's event stream to
    * validity intervals over their event_type "state" — a row per state
    * CHANGE with [valid_from, valid_to) and a version counter; the
    * current state has NULL valid_to. Both windows share one (user_id)
    * shuffle and one sort; ties inside a timestamp break by event_id so
    * the interval chain is total and engine-identical.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("__prev", lag("event_type", 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("version"))
      .orderBy("user_id", "version")
  }

  private val scd2Oracle =
    """WITH m AS (SELECT user_id, event_type, ts, event_id,
      |  lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_type, ts, event_id FROM m
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  CAST(row_number() OVER w AS INT) AS version
      |FROM c
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Distribution-rank window metrics per market segment:
    * percent_rank and cume_dist over a TOTAL order (acctbal, custkey —
    * the key tiebreak makes both engines' ranks identical), plus the
    * gap to the previous balance. One keyed shuffle, three window
    * functions sharing the sort.
    */
  def rankMetrics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy("c_acctbal", "c_custkey")
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"),
        round(col("c_acctbal") - lag("c_acctbal", 1).over(w), 2)
          .as("gap_to_prev"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  private val rankMetricsOracle =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cum_dist,
      |  round(c_acctbal - lag(c_acctbal) OVER w, 2) AS gap_to_prev
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** TPC-H Q3-shaped shipping priority: customer⋈orders⋈lineitem with
    * date straddle, revenue per open order, top 10. Plan posture: the
    * filtered customer SEGMENT is a broadcast dim into orders; the
    * orders⋈lineitem join is the only fact-fact join (keyed on
    * orderkey — at 100 TB both sides bucket on it); top-10 is a
    * TakeOrdered, never a global sort. Revenue sums in DECIMAL, cast
    * double at the end; order (revenue desc, o_orderdate, l_orderkey)
    * is total.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-01 00:00:00").cast("timestamp")
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  private val shippingPriorityOracle =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped regional volume: the six-table chain
    * region⋈nation⋈supplier⋈customer⋈orders⋈lineitem with the
    * local-supplier condition (customer and supplier share a nation).
    * region/nation/supplier broadcast (true dims); customer SCALES
    * WITH the facts and therefore joins KEYED on custkey (broadcasting
    * it would ship a fact-sized table to every task at 100 TB — AQE
    * may still elect broadcast at small SF, which is fine because
    * that's a size-based runtime decision, not a plan-time hint);
    * orders⋈lineitem is the one fact-fact keyed join. DECIMAL
    * revenue, total (revenue desc, n_name) order.
    */
  def regionalVolume(s: SparkSession, dir: String): DataFrame = {
    val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = t(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cus = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(cus, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val regionalVolumeOracle =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN supplier ON s_nationkey = n_nationkey
      |JOIN lineitem ON l_suppkey = s_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |  AND c_nationkey = s_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** LATERAL correlated subquery — per-region top-2 nations by
    * customer count, the "top-N of a correlated aggregate per outer
    * row" SQL surface (`topk_per_group` does the window form; this is
    * the subquery form Catalyst plans via DecorrelateInnerQuery —
    * SQL-authored, like [[groupingSetsRevenue]]). Deterministic: the
    * LATERAL's own (cnt DESC, n_name) order breaks count ties
    * identically in both engines.
    */
  def lateralTopNations(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "region").createOrReplaceTempView("region_v")
    t(s, dir, "nation").createOrReplaceTempView("nation_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT r_name, n_name, cnt FROM region_v,
        |LATERAL (
        |  SELECT n_name, count(*) AS cnt
        |  FROM nation_v JOIN customer_v ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r_regionkey
        |  GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2)
        |ORDER BY r_name, cnt DESC, n_name""".stripMargin)
  }

  private val lateralTopNationsOracle =
    """SELECT r_name, n_name, cnt FROM region,
      |LATERAL (
      |  SELECT n_name, count(*) AS cnt
      |  FROM nation JOIN customer ON c_nationkey = n_nationkey
      |  WHERE n_regionkey = r_regionkey
      |  GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) t
      |ORDER BY r_name, cnt DESC, n_name""".stripMargin

  /** Explicit window FRAMES: first_value / last_value / nth_value over
    * the full-partition frame plus a trailing ROWS 3..1 max — the
    * value-picking window family `rank_metrics` (ranks) and
    * `running_totals` (cumulative frame) don't cover. Value-picking
    * over a deterministic total order is bit-exact in both engines.
    */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wAll = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wTrail = w.rowsBetween(-3, -1)
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_totalprice")).over(wAll).as("first_price"),
      last(col("o_totalprice")).over(wAll).as("last_price"),
      nth_value(col("o_totalprice"), 2).over(wAll).as("second_price"),
      max(col("o_totalprice")).over(wTrail).as("trail3_max"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val windowFramesOracle =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER wa AS first_price,
      |  last_value(o_totalprice) OVER wa AS last_price,
      |  nth_value(o_totalprice, 2) OVER wa AS second_price,
      |  max(o_totalprice) OVER wt AS trail3_max
      |FROM orders
      |WINDOW
      |  wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  wt AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** UNPIVOT (wide → long): the inverse of the pivot pair — per-type
    * metrics melted to (event_type, name, val) rows via the native
    * `Dataset.unpivot` (Spark's melt; a pure projection + generator,
    * no shuffle beyond the feeding aggregate). Decimal-exact mean,
    * doubles rounded to 6 dp in both engines.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.load(s, dir, "events").groupBy("event_type").agg(
      round(sum(col("value").cast(DecimalType(18, 2))).cast("double") /
        count(col("value")), 6).as("avg_value"),
      count(lit(1)).cast("double").as("n"),
      round(max(col("value")), 6).as("max_value"))
    wide.unpivot(Array(col("event_type")),
        Array(col("avg_value"), col("n"), col("max_value")),
        "name", "val")
      .orderBy("event_type", "name")
  }

  private val unpivotMetricsOracle =
    """WITH wide AS (
      |  SELECT event_type,
      |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |          / count(value), 6) AS avg_value,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    round(max(value), 6) AS max_value
      |  FROM events GROUP BY 1)
      |SELECT event_type, name, val
      |FROM wide UNPIVOT (val FOR name IN (avg_value, n, max_value))
      |ORDER BY event_type, name""".stripMargin

  /** Incrementally-maintained monthly revenue view
    * ([[graft.extra.IncrementalAgg]]): the state is built as three
    * maintenance eras — init on history, then two delta refreshes that
    * re-read ONLY the delta rows and rewrite only the state files whose
    * month range they touch — and the SERVED result still hash-matches
    * the oracle's one-shot GROUP BY over everything. The maintenance
    * path (the thing that makes a 100 TB view refreshable in O(delta))
    * IS what this query exercises; the content-keyed cache gives later
    * calls the serving cost, like the other index-backed queries.
    */
  def incrRevenue(s: SparkSession, dir: String): DataFrame = {
    import graft.extra.IncrementalAgg
    val rows = t(s, dir, "orders").select(
      date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      dec("o_totalprice").as("price"))
    val spec = IncrementalAgg.ViewSpec("month",
      sumCols = Seq("price"), minCols = Seq("price"),
      maxCols = Seq("price"))
    val fp = IndexedCorpus.fingerprint(rows, col("month"), col("price"))
    val state = IndexedCorpus.cachedDir("graft_qincr",
        IndexedCorpus.Ver.incr, fp) { d =>
      val base = rows.filter(col("month") < "1999-01")
      val d1 = rows.filter(
        col("month") >= "1999-01" && col("month") < "2000-07")
      val d2 = rows.filter(col("month") >= "2000-07")
      IncrementalAgg.init(base, spec, d.toString, numFiles = 8)
      IncrementalAgg.refresh(s, d.toString, d1, spec)
      IncrementalAgg.refresh(s, d.toString, d2, spec)
    }
    IncrementalAgg.read(s, state)
      .select(col("month"), col("cnt").as("n_orders"),
        col("sum_price").cast("double").as("revenue"),
        col("min_price").cast("double").as("min_price"),
        col("max_price").cast("double").as("max_price"))
      .orderBy("month")
  }

  /** Large⋈large join with an explicit Bloom runtime filter
    * ([[graft.ops.Joins.bloomPrefilteredJoin]]): the selective order
    * predicate (~3% of orders) is invisible to lineitem's scan, so a
    * plain join shuffles every lineitem row; the bloom built over the
    * filtered orders' keys drops non-matching lineitem rows BEFORE the
    * shuffle, and false positives are re-verified by the equijoin —
    * result bit-identical to the plain join the oracle runs.
    */
  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders").filter(
      col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 2000)
    graft.ops.Joins
      .bloomPrefilteredJoin(t(s, dir, "lineitem"), Seq("l_orderkey"),
        urgent, Seq("o_orderkey"), expectedKeys = 1L << 16)
      .groupBy(month(col("o_orderdate")).as("mth"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec("l_extendedprice")
          * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("mth")
  }

  private val bloomJoinOracle =
    """SELECT CAST(month(o_orderdate) AS INTEGER) AS mth,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 2000
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  private val incrRevenueOracle =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("shipping_priority",
      "TPC-H Q3 shape: segment dim broadcast, one fact-fact keyed join, top-10 TakeOrdered",
      shippingPriority, Some(shippingPriorityOracle)),
    QueryDef("regional_volume",
      "TPC-H Q5 shape: six-table chain, four broadcast dims, local-supplier condition",
      regionalVolume, Some(regionalVolumeOracle)),
    QueryDef("rank_metrics",
      "percent_rank/cume_dist/lag gap per segment (total-order window)",
      rankMetrics, Some(rankMetricsOracle)),
    QueryDef("scd2_intervals",
      "SCD Type-2 validity intervals from the event stream (one shuffle)",
      scd2Intervals, Some(scd2Oracle)),
    QueryDef("value_quantiles",
      "exact interpolated per-key quantiles via rank selection",
      valueQuantiles, Some(valueQuantilesOracle)),
    QueryDef("q1_pricing",
      "TPC-H Q1-like pricing summary (decimal-exact sums)",
      q1Pricing, Some(q1Oracle)),
    QueryDef("revenue_by_nation",
      "star join lineitem⋈supplier⋈nation⋈region, broadcast dims",
      revenueByNation, Some(revenueByNationOracle)),
    QueryDef("customer_orders",
      "orders⋈customer per-customer aggregates + having",
      customerOrders, Some(customerOrdersOracle)),
    QueryDef("brand_revenue",
      "lineitem⋈part broadcast-dim revenue per brand",
      brandRevenue, Some(brandRevenueOracle)),
    QueryDef("topk_per_group",
      "top-3 line items per return flag (ranked window)",
      topKPerGroup, Some(topKOracle)),
    QueryDef("orphan_check",
      "anti-join referential check both directions + union",
      orphanCheck, Some(orphanCheckOracle)),
    QueryDef("distinct_users",
      "exact count-distinct per group",
      distinctUsers, Some(distinctUsersOracle)),
    QueryDef("cms_freq",
      "Count-Min sketch point frequencies vs truth (oracle-exact cells)",
      cmsFreq, Some(cmsFreqOracle)),
    QueryDef("skyline_parts",
      "2-D Pareto frontier (min price, max size) via sorted dominance",
      skylineParts, Some(skylineOracle)),
    QueryDef("approx_distinct_users",
      "HLL++ approx count-distinct (engine-specific estimate; no oracle)",
      approxDistinctUsers, None),
    QueryDef("hll_sketch_users",
      "mergeable per-day HLL sketches unioned per type (no oracle)",
      hllSketchUsers, None),
    QueryDef("rollup_daily",
      "rollup (event_type, day) with grouping_id",
      rollupDaily, Some(rollupDailyOracle)),
    QueryDef("cube_daily",
      "cube (event_type, day): all four grouping combinations, one pass",
      cubeDaily, Some(cubeDailyOracle)),
    QueryDef("grouping_sets_revenue",
      "GROUPING SETS ((priority),(year),()): non-hierarchical one-pass revenue",
      groupingSetsRevenue, Some(groupingSetsRevenueOracle)),
    QueryDef("stats_by_type",
      "statistical aggregates: stddev/variance/median/corr per group",
      statsByType, Some(statsByTypeOracle)),
    QueryDef("set_ops",
      "intersect + except over weekly activity",
      setOps, Some(setOpsOracle)),
    QueryDef("running_totals",
      "per-customer cumulative order totals (frame window)",
      runningTotals, Some(runningTotalsOracle)),
    QueryDef("trailing_revenue_7d",
      "time-based RANGE frame: 7-day trailing revenue per customer",
      trailingRevenue, Some(trailingRevenueOracle)),
    QueryDef("custkey_deciles",
      "ntile(10) account-balance deciles + per-decile stats",
      custkeyDeciles, Some(custkeyDecilesOracle)),
    QueryDef("orders_by_month",
      "calendar extraction rollup (year/quarter/month revenue)",
      ordersByMonth, Some(ordersByMonthOracle)),
    QueryDef("incr_revenue",
      "incrementally-maintained monthly revenue view (init + 2 delta " +
        "refreshes, O(delta) maintenance) == one-shot GROUP BY",
      incrRevenue, Some(incrRevenueOracle)),
    QueryDef("bloom_join",
      "large⋈large join with explicit Bloom runtime prefilter on the " +
        "big side (bit-identical to the plain join)",
      bloomJoin, Some(bloomJoinOracle)),
    QueryDef("lateral_top_nations",
      "LATERAL correlated subquery: per-region top-2 nations " +
        "(the subquery form of top-N per group)",
      lateralTopNations, Some(lateralTopNationsOracle)),
    QueryDef("window_frames",
      "first/last/nth_value full-partition frame + trailing ROWS 3..1 " +
        "max (value-picking window family)",
      windowFrames, Some(windowFramesOracle)),
    QueryDef("unpivot_metrics",
      "native unpivot/melt wide->long (inverse of the pivot pair)",
      unpivotMetrics, Some(unpivotMetricsOracle)),
    QueryDef("semi_join",
      "left-semi join (EXISTS) customers with filed orders",
      semiJoin, Some(semiJoinOracle)),
    QueryDef("sql_above_avg",
      "SQL-authored correlated scalar subquery (decimal-exact compare)",
      sqlAboveAvg, Some(sqlAboveAvgOracle)))
}
