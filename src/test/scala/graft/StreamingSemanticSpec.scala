package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.extra.SemanticIndex
import graft.streaming.SemanticIngest

/** Streaming semantic-dedup ingest ([[graft.streaming.SemanticIngest]]):
  * N micro-batches through the verdict→sink→append-survivors chain
  * must leave the verdict outputs AND the index identical to driving
  * the same batches through the batch API, a near-copy of an earlier
  * batch's SURVIVOR must flag while a copy of a dropped dup is not
  * re-anchored, and a crash-replayed batchId must be a no-op — the
  * [[StreamingMinhashSpec]] contract on the embedding arm.
  */
class StreamingSemanticSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private val corpus = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0f, 1f, 0f, 0f)))
    .toDF("doc_id", "embedding")
  // batch 1: 100 near-copies corpus 0 (dropped); 101 is a fresh
  // direction (survives). batch 2: 200 near-copies SURVIVOR 101 →
  // flagged onto 101; 201 re-runs dropped 100's direction → anchors
  // to corpus 0 (the axis's indexed survivor), never to dropped 100;
  // 202 is clean.
  private val b1 = Seq(
    (100L, Seq(0.99f, 0.01f, 0f, 0f)),
    (101L, Seq(0f, 0f, 0.6f, 0.8f)))
  private val b2 = Seq(
    (200L, Seq(0f, 0f, 0.61f, 0.795f)),
    (201L, Seq(0.985f, 0.015f, 0f, 0f)),
    (202L, Seq(0f, 0.1f, 0.1f, -0.99f)))

  private def verdicts(dir: String) =
    spark.read.parquet(dir)
      .select("doc_id", "is_dup", "dup_of")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("streamed semantic ingest ≡ the batch API driven manually; " +
      "survivor anchoring semantics hold across batches") {
    val streamIdx = tmp("sem_stream_idx")
    val batchIdx = tmp("sem_batch_idx")
    val outDir = tmp("sem_stream_out")
    SemanticIndex.build(corpus, "doc_id", "embedding", streamIdx)
    SemanticIndex.build(corpus, "doc_id", "embedding", batchIdx)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val ckpt = tmp("sem_stream_ckpt")
    val q = SemanticIngest.start(mem.toDF().toDF("doc_id", "embedding"),
      streamIdx, outDir, ckpt, threshold = 0.95,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def drive(rows: Seq[(Long, Seq[Float])], out: String): Unit = {
      val df = rows.toDF("doc_id", "embedding")
      val v = SemanticIndex.dedupBatch(spark, batchIdx, df,
        "doc_id", "embedding", threshold = 0.95)
      v.write.mode("overwrite").parquet(out)
      val kept = spark.read.parquet(out).filter(!col("is_dup"))
        .select("doc_id")
      SemanticIndex.append(df.join(kept, Seq("doc_id"), "left_semi"),
        "doc_id", "embedding", batchIdx): Unit
    }
    val ref1 = tmp("sem_ref1"); val ref2 = tmp("sem_ref2")
    drive(b1, s"$ref1/batch=0")
    drive(b2, s"$ref2/batch=1")

    assert(verdicts(s"$outDir/batch=0") == verdicts(s"$ref1/batch=0"))
    assert(verdicts(s"$outDir/batch=1") == verdicts(s"$ref2/batch=1"))
    val v2 = spark.read.parquet(s"$outDir/batch=1")
      .select("doc_id", "is_dup", "dup_of").orderBy("doc_id").collect()
    assert(v2(0).getBoolean(1) && v2(0).getLong(2) == 101L)
    assert(v2(1).getBoolean(1) && v2(1).getLong(2) == 0L)
    assert(!v2(2).getBoolean(1))
    // end-state indexes hold the same live ids
    def liveIds(dir: String) = {
      val (_, e) = graft.extra.IndexManifests.latest(spark, dir).get
      e("vectors")
        .map(s => spark.read.parquet(s"$dir/$s").select("d"))
        .reduce(_ unionByName _)
        .orderBy("d").collect().map(_.getLong(0)).toSeq
    }
    assert(liveIds(streamIdx) == liveIds(batchIdx))
    assert(liveIds(streamIdx) == Seq(0L, 1L, 101L, 202L))
  }

  test("crash-replayed batchId is a no-op: index version and verdict " +
      "parquet unchanged") {
    val idx = tmp("sem_replay_idx")
    val out = tmp("sem_replay_out")
    SemanticIndex.build(corpus, "doc_id", "embedding", idx)
    val df = b1.toDF("doc_id", "embedding")
    assert(SemanticIngest.applyBatch(spark, idx, out, df,
      "doc_id", "embedding", 0.95, "sX", 0L))
    val v = graft.extra.IndexManifests.latest(spark, idx).get._1
    val rows = verdicts(s"$out/batch=0")
    assert(!SemanticIngest.applyBatch(spark, idx, out, df,
      "doc_id", "embedding", 0.95, "sX", 0L))
    assert(graft.extra.IndexManifests.latest(spark, idx).get._1 == v)
    assert(verdicts(s"$out/batch=0") == rows)
  }

  test("auto-compaction bounds segment count across a 10-batch ingest " +
      "with replay safety") {
    val idx = tmp("sem_ac_idx")
    val out = tmp("sem_ac_out")
    SemanticIndex.build(corpus, "doc_id", "embedding", idx)
    val rnd = new scala.util.Random(7)
    for (b <- 0 until 10) {
      val rows = (0 until 5).map(i =>
        (1000L + b * 10 + i, Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)))
      assert(SemanticIngest.applyBatch(spark, idx, out,
        rows.toDF("doc_id", "embedding"), "doc_id", "embedding",
        0.99, "sAC", b.toLong, autoCompactFanout = 3))
    }
    val (_, entries) = graft.extra.IndexManifests.latest(spark, idx).get
    // tiered bound: < fanout segments per size tier, ~log tiers
    assert(entries("vectors").size <= 7)
    // replay of the last batch after the folds: still a no-op
    assert(!SemanticIngest.applyBatch(spark, idx, out,
      Seq((9999L, Seq(1f, 1f, 1f, 1f))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", 0.99, "sAC", 9L))
  }
}
