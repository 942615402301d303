package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extra.{Layout, Merge}
import graft.streaming.MergeStream

/** Streaming CDC apply (r10): any split of a change set into
  * micro-batches, in any order, must converge the table to the same
  * state — one row per key, the max-version row. The version guard in
  * [[Merge.upsertVersioned]] is what buys this; a plain upsert sink
  * would be order- and replay-sensitive.
  */
class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched CDC stream converges to max-version-per-key " +
      "regardless of batch boundaries; late stale batch is a no-op") {
    val dir = Files.createTempDirectory("merge_stream").toString
    val base = spark.range(50).select(col("id"),
      lit(0L).as("ver"), concat(lit("base-"), col("id")).as("text"))
    Layout.writeClustered(base, dir, Seq(col("id")), 4)

    // the change set: keys updated multiple times with OUT-OF-ORDER
    // versions split across batch boundaries — batch 2 carries older
    // versions for keys 1 and 2 than batch 1 already applied
    val b1 = Seq((1L, 4L, "one-v4"), (2L, 6L, "two-v6"), (60L, 1L, "new60"))
    val b2 = Seq((1L, 2L, "one-v2-stale"), (2L, 5L, "two-v5-stale"),
      (3L, 3L, "three-v3"), (60L, 2L, "new60-v2"))

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val ckpt = Files.createTempDirectory("merge_stream_ckpt").toString
    val q = MergeStream.start(mem.toDF().toDF("id", "ver", "text"),
      dir, ckpt, "id", "ver", trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    // driver model: max-version row per key over base ∪ all changes
    val model = (base.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))) ++ b1 ++ b2)
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == model)
    assert(got.contains((1L, 4L, "one-v4"))) // stale b2 row discarded
    assert(got.contains((2L, 6L, "two-v6")))
    assert(got.contains((60L, 2L, "new60-v2"))) // cross-batch upgrade

    // crash-replay simulation: re-applying an already-applied batch
    // through the same operator leaves the table bit-identical
    Merge.upsertVersioned(spark, dir, b1.toDF("id", "ver", "text"),
      "id", "ver")
    val again = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(again == model)
  }
}
