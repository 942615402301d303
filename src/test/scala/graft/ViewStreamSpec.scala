package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extra.IncrementalAgg
import graft.extra.IncrementalAgg.ViewSpec
import graft.streaming.ViewStream

/** Streaming materialized-view maintenance: any micro-batching of the
  * input converges to the one-shot state, and the applied-batch ledger
  * makes replays no-ops (the combine refresh alone would double-count).
  */
class ViewStreamSpec extends SparkSpec {
  import spark.implicits._

  private val spec = ViewSpec("g", sumCols = Seq("amt"),
    minCols = Seq("amt"), maxCols = Seq("amt"))

  private def rows(ids: Range): Seq[(Long, java.math.BigDecimal)] =
    ids.map(i => (i.toLong % 9,
      new java.math.BigDecimal(s"${i * 3 % 50}.25"))).toSeq

  private def served(dir: String): Seq[(Long, Long, Double, Double, Double)] =
    IncrementalAgg.read(spark, dir)
      .select(col("g"), col("cnt"), col("sum_amt").cast("double"),
        col("min_amt").cast("double"), col("max_amt").cast("double"))
      .as[(Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq

  test("micro-batched stream (bootstrap + refreshes) converges to the " +
      "one-shot view; replayed batch is a ledger no-op") {
    val dir = Files.createTempDirectory("view_stream").toString
    val ckpt = Files.createTempDirectory("view_stream_ckpt").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.math.BigDecimal)]
    val in = mem.toDF().toDF("g", "amt")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"))
    val q = ViewStream.start(in, dir, ckpt, spec, numFiles = 2,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(rows(0 until 40))   // batch 0: bootstrap (init)
      q.processAllAvailable()
      mem.addData(rows(40 until 90))  // batch 1: refresh
      q.processAllAvailable()
      mem.addData(rows(90 until 120)) // batch 2: refresh
      q.processAllAvailable()
    } finally q.stop()

    val full = Files.createTempDirectory("view_full").toString
    val all = rows(0 until 120).toDF("g", "amt")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"))
    IncrementalAgg.init(all, spec, full, numFiles = 2)
    assert(served(dir) == served(full))

    // crash-replay: re-apply an already-applied batchId — the ledger
    // must refuse (combine would double-count otherwise)
    val replay = rows(40 until 90).toDF("g", "amt")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"))
    val applied = ViewStream.applyBatch(replay, dir, spec, batchId = 1L)
    assert(!applied)
    assert(served(dir) == served(full))

    // a NEW batch id with the same data does apply (proves the ledger,
    // not some content check, is what blocked the replay)
    assert(ViewStream.applyBatch(replay, dir, spec, batchId = 99L))
    assert(served(dir) != served(full))
  }

  test("empty batch applies as a no-op without a marker side effect") {
    val dir = Files.createTempDirectory("view_empty").toString
    val init = rows(0 until 20).toDF("g", "amt")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"))
    assert(ViewStream.applyBatch(init, dir, spec, batchId = 0L))
    val before = served(dir)
    val empty = init.filter(lit(false))
    assert(!ViewStream.applyBatch(empty, dir, spec, batchId = 1L))
    assert(served(dir) == before)
  }
}
