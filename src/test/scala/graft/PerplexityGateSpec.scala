package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.extra.KnLm
import graft.streaming.PerplexityGate

/** Streaming perplexity gate ([[graft.streaming.PerplexityGate]]): N
  * micro-batches through the frozen-model score must union to exactly
  * the batch scorer's output on the same docs (the gate is a pure
  * per-batch function of a static model), keep verdicts honor the
  * threshold, and replaying a batch directory is byte-stable
  * (Overwrite idempotence).
  */
class PerplexityGateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches == one batch score; keep threshold " +
      "applied; short docs drop") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = KnLm.fit(
      Seq(1L -> "a b c", 2L -> "a b c a b c").toDF("doc_id", "text"),
      "text")
    val out = Files.createTempDirectory("knpg_out").toString
    val ckpt = Files.createTempDirectory("knpg_ck").toString
    val b1 = Seq(10L -> "a b c", 11L -> "b b c a b b")
    val b2 = Seq(12L -> "z z c", 13L -> "xy") // 13: <3 tokens, drops
    val mem = MemoryStream[(Long, String)]
    // ce("a b c") = 0.133531 keeps at 0.7; ce("b b c a b b") =
    // 1.101436 and ce("z z c") = 1.098612 do not (KnLmSpec values)
    val q = PerplexityGate.start(
      mem.toDF().toDF("doc_id", "text"), model, out, ckpt,
      maxCrossEntropy = 0.7, trigger = Trigger.ProcessingTime(0))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_trigrams", "cross_entropy", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    val batch = KnLm.score((b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .withColumn("keep", col("cross_entropy") <= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(t => t._1 -> t._4).toMap ==
      Map(10L -> true, 11L -> false, 12L -> false)) // 13 dropped
    // replaying a batch overwrites identical verdicts (pure function
    // of frozen model + batch — the no-ledger idempotence contract)
    PerplexityGate.applyBatch(spark, model, out,
      b1.toDF("doc_id", "text"), "doc_id", "text", 0.7, batchId = 0L)
    val replayed = spark.read.parquet(out)
      .select("doc_id", "n_trigrams", "cross_entropy", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(replayed == streamed)
  }
}
