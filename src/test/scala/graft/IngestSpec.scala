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

  test("malformed CSV rows become nulls under the enforced schema") {
    val dir = Files.createTempDirectory("badcsv").toString
    Files.writeString(java.nio.file.Path.of(dir, "x.csv"),
      "symbol,price,event_time_ms\nAAPL,1.5,1000\nMSFT,notanumber,2000\n")
    val df = TickParse.readBackfillCsv(spark, dir)
    assert(df.count() == 2)
    assert(df.filter(col("price").isNull).count() == 1)
  }
}
