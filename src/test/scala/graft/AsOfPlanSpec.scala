package graft

import org.apache.spark.sql.functions._

import graft.extra.TimeSeries
import graft.model.Tables
import graft.plans.AsOf

/** Native as-of operator (custom LogicalPlan/Strategy/Exec) — must agree
  * exactly with the composed-builtins window formulation on real data
  * and on hand-built edge cases.
  */
class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of matches the window formulation on events (sf0.001)") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("click_ts"))
    val viaWindow = TimeSeries.asofJoin(purchases, clicks, "user_id", "ts",
      Seq("value", "click_ts"))
      .select("event_id", "asof_value", "asof_click_ts")
      .orderBy("event_id").collect().toSeq
    val viaNative = AsOf.join(purchases, clicks, "user_id", "ts",
      Seq("value", "click_ts"))
      .select("event_id", "asof_value", "asof_click_ts")
      .orderBy("event_id").collect().toSeq
    assert(viaNative.nonEmpty)
    assert(viaNative == viaWindow)
  }

  test("native as-of edge cases: tie counts as prior, no-prior is null, key isolation") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", 100L),  // tie with right at 10:00
      (1L, "2024-01-01 08:00:00", 101L),  // before any right row
      (2L, "2024-01-01 12:00:00", 102L))  // other key: must not see key 1
      .toDF("k", "ts", "lid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 1.0),
      (1L, "2024-01-01 10:00:00", 2.0),
      (1L, "2024-01-01 11:00:00", 3.0),
      (3L, "2024-01-01 01:00:00", 9.0))
      .toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOf.join(left, right, "k", "ts", Seq("v"))
      .orderBy("lid")
      .select("lid", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(out == Seq(
      (100L, Some(2.0)),   // tie: 10:00 right row counts
      (101L, None),        // nothing at or before 08:00
      (102L, None)))       // key 2 has no right rows at all
  }

  test("native as-of tolerates null timestamps (null ts never matches)") {
    val left = Seq(
      (1L, Some("2024-01-01 10:00:00"), 100L),
      (1L, None, 101L),                  // null left ts: unmatched, no NPE
      (2L, Some("2024-01-01 12:00:00"), 102L))
      .toDF("k", "ts", "lid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, Some("2024-01-01 09:00:00"), 1.0),
      (1L, None, 7.0),                   // null right ts: skipped
      (2L, None, 8.0))                   // only-null right for key 2
      .toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOf.join(left, right, "k", "ts", Seq("v"))
      .orderBy("lid")
      .select("lid", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(out == Seq(
      (100L, Some(1.0)),   // the non-null 09:00 row matches
      (101L, None),        // null left ts is unmatched
      (102L, None)))       // all right ts null: unmatched
  }

  test("native forward + tolerance agree bit-for-bit with the window form") {
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"),
        col("ts").as("purchase_ts"))
    for (tol <- Seq(None, Some(3600L))) {
      val viaWindow = TimeSeries.asofJoin(clicks, purchases, "user_id", "ts",
        Seq("value", "purchase_ts"), direction = "forward",
        toleranceSeconds = tol)
        .select("event_id", "asof_value", "asof_purchase_ts")
        .orderBy("event_id").collect().toSeq
      val viaNative = AsOf.join(clicks, purchases, "user_id", "ts",
        Seq("value", "purchase_ts"), direction = "forward",
        toleranceSeconds = tol)
        .select("event_id", "asof_value", "asof_purchase_ts")
        .orderBy("event_id").collect().toSeq
      assert(viaNative.nonEmpty)
      assert(viaNative == viaWindow, s"tolerance=$tol")
    }
  }

  test("native backward tolerance nulls stale matches only") {
    val left = Seq(
      (1L, "2024-01-01 10:00:00", 100L),  // click 1 min before: within 300s
      (1L, "2024-01-01 18:00:00", 101L))  // latest click 8h stale: nulled
      .toDF("k", "ts", "lid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 09:59:00", 1.0))
      .toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOf.join(left, right, "k", "ts", Seq("v"),
      toleranceSeconds = Some(300L))
      .orderBy("lid").select("lid", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(out == Seq((100L, Some(1.0)), (101L, None)))
  }

  test("native as-of plan contains AsOfJoinExec (strategy fired)") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 5.0))
      .toDF("k", "ts", "v")
    val df = AsOf.join(left, right, "k", "ts", Seq("v"))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.collect().head.getDouble(3) == 5.0)
  }
}
