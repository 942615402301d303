package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.extra.MinhashIndex
import graft.streaming.MinhashIngest

/** Streaming incremental near-dup ingest: N micro-batches through the
  * verdict→sink→append-survivors chain must leave the verdict outputs
  * AND the index identical to driving the same batches through the
  * batch API, and a crash-replayed batchId must be a no-op.
  */
class StreamingMinhashSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight again"),
    (1L, "corpus only words nothing shared with anything else here"))
    .toDF("doc_id", "text")
  // batch 1: 100 is a near-copy of corpus 0; 101 is clean but fresh.
  // batch 2: 200 near-copies 101 (the SURVIVOR — must flag), 201 clean.
  private val b1 = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight folks"),
    (101L, "fresh shared run alpha beta gamma delta epsilon zeta eta"))
  private val b2 = Seq(
    (200L, "fresh shared run alpha beta gamma delta epsilon zeta iota"),
    (201L, "another clean follow up document with new words entirely"))

  private def verdicts(dir: String) =
    spark.read.parquet(dir)
      .select("doc_id", "is_dup", "dup_of")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("streamed verdict-ingest ≡ the batch API driven manually; a " +
      "near-copy of an earlier batch's SURVIVOR is flagged while a " +
      "near-copy of a dropped dup is not re-anchored") {
    val streamIdx = tmp("minh_stream_idx")
    val batchIdx = tmp("minh_batch_idx")
    val outDir = tmp("minh_stream_out")
    MinhashIndex.build(corpus, "doc_id", "text", streamIdx)
    MinhashIndex.build(corpus, "doc_id", "text", batchIdx)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = tmp("minh_stream_ckpt")
    val q = MinhashIngest.start(mem.toDF().toDF("doc_id", "text"),
      streamIdx, outDir, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // manual batch drive against the twin index
    def drive(rows: Seq[(Long, String)], out: String): Unit = {
      val df = rows.toDF("doc_id", "text")
      val v = MinhashIndex.dedupBatch(spark, batchIdx, df,
        "doc_id", "text")
      v.write.mode("overwrite").parquet(out)
      val kept = spark.read.parquet(out).filter(!col("is_dup"))
        .select("doc_id")
      MinhashIndex.append(df.join(kept, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text")), "doc_id", "text", batchIdx)
    }
    val ref1 = tmp("minh_ref1"); val ref2 = tmp("minh_ref2")
    drive(b1, s"$ref1/batch=0")
    drive(b2, s"$ref2/batch=1")

    assert(verdicts(s"$outDir/batch=0") == verdicts(s"$ref1/batch=0"))
    assert(verdicts(s"$outDir/batch=1") == verdicts(s"$ref2/batch=1"))
    // semantics: 100 flagged against corpus 0; 200 flagged against
    // the SURVIVOR 101
    val v2 = spark.read.parquet(s"$outDir/batch=1")
      .orderBy("doc_id").collect()
    assert(v2(0).getBoolean(1) && v2(0).getLong(2) == 101L)
    assert(!v2(1).getBoolean(1))
    // end-state indexes agree (same live content)
    def liveSets(dir: String) = {
      val (_, e) = graft.extra.IndexManifests
        .latest(spark, dir).map(t => (t._1, t._2)).get
      spark.read.parquet(
          e("sets").map(s => s"$dir/$s"): _*)
        .select("d").orderBy("d").collect().map(_.getLong(0)).toSeq
    }
    assert(liveSets(streamIdx) == liveSets(batchIdx))
    assert(liveSets(streamIdx) == Seq(0L, 1L, 101L, 201L))
  }

  test("crash-replayed batchId is a no-op: index version and verdict " +
      "parquet unchanged; the pre-commit replay window rewrites " +
      "identical rows") {
    val idx = tmp("minh_replay_idx")
    val out = tmp("minh_replay_out")
    MinhashIndex.build(corpus, "doc_id", "text", idx)
    val df = b1.toDF("doc_id", "text")
    assert(graft.streaming.MinhashIngest.applyBatch(spark, idx, out,
      df, "doc_id", "text", "sX", 0L, 0.5))
    val v = graft.extra.IndexManifests.latest(spark, idx).get._1
    val rows = verdicts(s"$out/batch=0")
    // post-commit replay: ledger skips the whole batch
    assert(!graft.streaming.MinhashIngest.applyBatch(spark, idx, out,
      df, "doc_id", "text", "sX", 0L, 0.5))
    assert(graft.extra.IndexManifests.latest(spark, idx).get._1 == v)
    assert(verdicts(s"$out/batch=0") == rows)
  }
}
