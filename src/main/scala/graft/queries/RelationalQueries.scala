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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing",
      "TPC-H Q1-like pricing summary (decimal-exact sums)",
      q1Pricing, Some(q1Oracle)),
    QueryDef("revenue_by_nation",
      "star join lineitem⋈supplier⋈nation⋈region, broadcast dims",
      revenueByNation, Some(revenueByNationOracle)),
    QueryDef("customer_orders",
      "orders⋈customer per-customer aggregates + having",
      customerOrders, Some(customerOrdersOracle)),
    QueryDef("topk_per_group",
      "top-3 line items per return flag (ranked window)",
      topKPerGroup, Some(topKOracle)),
    QueryDef("orphan_check",
      "anti-join referential check both directions + union",
      orphanCheck, Some(orphanCheckOracle)))
}
