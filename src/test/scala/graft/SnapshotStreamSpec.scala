package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extra.Snapshots
import graft.streaming.SnapshotStream

/** Streaming CDC into a snapshot-versioned table (r11): same
  * batching-invariance as [[graft.streaming.MergeStream]], PLUS
  * per-batch committed versions (readers time-travel the stream) and
  * a manifest-committed transaction token that makes replays SKIP
  * instead of re-commit — exactly-once, decided from the same atomic
  * manifest the data rides.
  */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def slurp(dir: String, v: Option[Long] = None) =
    Snapshots.read(spark, dir, v).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("micro-batched CDC converges to max-version-per-key; every " +
      "batch is a time-travelable version; stale rows discarded") {
    val dir = Files.createTempDirectory("snapstream").toString
    val base = spark.range(50).select(col("id"),
      lit(0L).as("ver"), concat(lit("base-"), col("id")).as("text"))
    Snapshots.init(base, dir, "id", numFiles = 4)

    val b1 = Seq((1L, 4L, "one-v4"), (2L, 6L, "two-v6"), (60L, 1L, "new60"))
    val b2 = Seq((1L, 2L, "one-v2-stale"), (2L, 5L, "two-v5-stale"),
      (3L, 3L, "three-v3"), (60L, 2L, "new60-v2"))

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val ckpt = Files.createTempDirectory("snapstream_ckpt").toString
    val q = SnapshotStream.start(mem.toDF().toDF("id", "ver", "text"),
      dir, ckpt, "id", "ver", trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val model = (base.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))) ++ b1 ++ b2)
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    assert(slurp(dir) == model)
    assert(slurp(dir).contains((1L, 4L, "one-v4"))) // stale discarded
    // each micro-batch committed one version: v0 base, v1 after b1
    val afterB1 = (base.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))) ++ b1)
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    assert(slurp(dir, Some(0L)) != slurp(dir, Some(1L)))
    assert(slurp(dir, Some(1L)) == afterB1)
  }

  test("replayed batch is SKIPPED via the manifest txn token — no " +
      "redundant version; a different app's batch ids don't collide") {
    val dir = Files.createTempDirectory("snaptxn").toString
    Snapshots.init(spark.range(10).select(col("id"), lit(0L).as("ver"),
      lit("x").as("text")), dir, "id", 2)

    val batch = Seq((1L, 5L, "one-v5")).toDF("id", "ver", "text")
    assert(SnapshotStream.applyBatch(batch, dir, "id", "ver",
      appId = "appA", batchId = 7L))
    val vAfter = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.committedTxn(spark, dir, vAfter)
      .contains(("appA", 7L)))
    assert(Snapshots.lastTxn(spark, dir, "appA").contains(7L))

    // crash-replay: the SAME (app, batch) must skip without committing
    assert(!SnapshotStream.applyBatch(batch, dir, "id", "ver",
      appId = "appA", batchId = 7L))
    assert(Snapshots.latestVersion(spark, dir).get == vAfter)
    // an older replay is likewise skipped
    assert(!SnapshotStream.applyBatch(batch, dir, "id", "ver",
      appId = "appA", batchId = 3L))

    // a DIFFERENT app with the same batch id is independent
    assert(SnapshotStream.applyBatch(
      Seq((2L, 5L, "two-v5")).toDF("id", "ver", "text"),
      dir, "id", "ver", appId = "appB", batchId = 7L))
    assert(Snapshots.lastTxn(spark, dir, "appB").contains(7L))
    // appA's ledger is unaffected by appB's newer commit
    assert(Snapshots.lastTxn(spark, dir, "appA").contains(7L))

    // interleaved NON-stream commits don't break the ledger walk
    Snapshots.upsert(spark, dir,
      Seq((3L, 1L, "plain")).toDF("id", "ver", "text"), "id")
    assert(Snapshots.lastTxn(spark, dir, "appA").contains(7L))
    assert(SnapshotStream.applyBatch(
      Seq((4L, 9L, "four-v9")).toDF("id", "ver", "text"),
      dir, "id", "ver", appId = "appA", batchId = 8L))
    assert(Snapshots.lastTxn(spark, dir, "appA").contains(8L))
  }

  test("upsertVersioned rejects duplicate (key, version) pairs and " +
      "wrong-key rewrites") {
    val dir = Files.createTempDirectory("snapvguard").toString
    Snapshots.init(spark.range(5).select(col("id"), lit(0L).as("ver"),
      lit("x").as("text")), dir, "id", 1)
    intercept[IllegalArgumentException] {
      Snapshots.upsertVersioned(spark, dir,
        Seq((1L, 5L, "a"), (1L, 5L, "b")).toDF("id", "ver", "text"),
        "id", "ver")
    }
    intercept[IllegalArgumentException] {
      Snapshots.upsertVersioned(spark, dir,
        Seq((1L, 5L, "a")).toDF("id", "ver", "text"), "ver", "id")
    }
    // re-typed column rejected (a mistyped batch would stage files
    // that disagree with the manifest's recorded schema)
    intercept[IllegalArgumentException] {
      Snapshots.upsertVersioned(spark, dir,
        Seq((1L, 5.0, "a")).toDF("id", "ver", "text"), "id", "ver")
    }
  }
}
