package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gen.TickGen
import graft.ops.{Features, TickParse}
import graft.ops.Features.FeatureConfig

/** Ingestion-path coverage: CSV backfill (reference S2) and the
  * reference-faithful arrival-order aggregation variant.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("CSV backfill round-trips and lands in identical windows") {
    val dir = Files.createTempDirectory("backfill").toString
    val ticks = TickGen.gbm(spark, 200)
    ticks.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(dir)
    val replayed = TickParse.readBackfillCsv(spark, dir)
    assert(replayed.count() == 200)
    // replay preserves event_time_ms => identical window assignment
    val cfg = FeatureConfig("60 seconds", Some("10 seconds"))
    val a = Features.compute(TickParse.withEventTime(ticks), cfg)
      .orderBy("symbol", "window_start").collect().toSeq
    val b = Features.compute(replayed, cfg)
      .orderBy("symbol", "window_start").collect().toSeq
    assert(a == b)
  }

  test("arrival-order variant matches deterministic variant on sorted single-partition input") {
    val ticks = TickGen.gbm(spark, 120)
      .orderBy("event_time_ms").coalesce(1)
    val parsed = TickParse.withEventTime(ticks)
    val cfg = FeatureConfig("60 seconds", None)
    val ref = Features.computeArrivalOrder(parsed, cfg)
      .select("symbol", "window_start", "first_price", "last_price")
      .orderBy("symbol", "window_start").collect().toSeq
    val det = Features.compute(parsed, cfg)
      .select("symbol", "window_start", "first_price", "last_price")
      .orderBy("symbol", "window_start").collect().toSeq
    assert(ref == det)
  }

  test("ORC backfill round-trips through the same normalize chain, " +
      "bit-identical windows to the CSV leg, with pushdown surviving " +
      "to the scan") {
    val dir = Files.createTempDirectory("backfill_orc").toString
    val ticks = TickGen.gbm(spark, 200)
    ticks.coalesce(1).write.mode("overwrite").orc(dir)
    val replayed = TickParse.readBackfillOrc(spark, dir)
    assert(replayed.count() == 200)
    val cfg = FeatureConfig("60 seconds", Some("10 seconds"))
    val a = Features.compute(TickParse.withEventTime(ticks), cfg)
      .orderBy("symbol", "window_start").collect().toSeq
    val b = Features.compute(replayed, cfg)
      .orderBy("symbol", "window_start").collect().toSeq
    assert(a == b)
    // columnar contract: a symbol filter reaches the ORC scan as a
    // pushed filter, and pruning drops the unreferenced column from
    // the read schema
    val filtered = replayed.filter(col("symbol") === "SYM1")
      .select("symbol", "price")
    filtered.count()
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("EqualTo(symbol,SYM1)"), scan)
    val read = scan.split("ReadSchema: ").lift(1).map(_.takeWhile(_ != '\n'))
      .getOrElse(fail(s"no ReadSchema in plan: $scan"))
    assert(read.contains("symbol") && read.contains("price") &&
      !read.contains("event_time_ms"), read)
  }

  test("malformed CSV rows become nulls under the enforced schema") {
    val dir = Files.createTempDirectory("badcsv").toString
    Files.writeString(java.nio.file.Path.of(dir, "x.csv"),
      "symbol,price,event_time_ms\nAAPL,1.5,1000\nMSFT,notanumber,2000\n")
    val df = TickParse.readBackfillCsv(spark, dir)
    assert(df.count() == 2)
    assert(df.filter(col("price").isNull).count() == 1)
  }
}
