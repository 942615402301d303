package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extra.AnnIndex
import graft.streaming.{AnnIngest, CurationStream}

/** Streaming ANN ingest (r10): curate → embed-stub → appendIvfPq per
  * micro-batch must land EXACTLY the rows one batch append would — the
  * streamed form of the append≡build equivalence AnnIndexSpec pins.
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs to the " +
      "old stone bridge in light rain"

  private def payload(id: Long, text: String, tMs: Long): String =
    s"""{"doc_id":$id,"text":"$text","event_time_ms":$tMs}"""

  test("N streamed micro-batches ≡ one batch append, bit-identical " +
      "codes layout (frozen codebooks)") {
    val base = Files.createTempDirectory("ann_ingest").toString
    // freeze the codebooks once: identical initial builds in both dirs
    // (sampleCodebook is hash-order deterministic)
    val init = spark.range(100).select(col("id").as("doc_id"),
      AnnIngest.embedStub(concat(lit("seed doc "), col("id")), 64)
        .as("embedding"))
    AnnIndex.buildAndWriteIvfPq(init, "doc_id", "embedding",
      s"$base/streamed", numCentroids = 8, m = 8, pqCentroids = 8)
    AnnIndex.buildAndWriteIvfPq(init, "doc_id", "embedding",
      s"$base/batch", numCentroids = 8, m = 8, pqCentroids = 8)

    val batch1 = (1000L to 1004L).map(i => (i, s"$good batch one mark $i"))
    val batch2 = (1005L to 1009L).map(i => (i, s"$good batch two mark $i"))

    // streamed path: two distinct micro-batches through the curation
    // front into the index
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = Files.createTempDirectory("ann_ingest_ckpt").toString
    val q = AnnIngest.start(CurationStream.curateStream(mem.toDF()),
      s"$base/streamed", ckpt, dim = 64,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(batch1.map { case (i, t) => payload(i, t, 1000000L + i) })
      q.processAllAvailable()
      mem.addData(batch2.map { case (i, t) => payload(i, t, 1100000L + i) })
      q.processAllAvailable()
    } finally q.stop()

    // batch path: the same docs, one append call
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    AnnIndex.appendIvfPq(spark, s"$base/batch",
      docs.select(col("doc_id"),
        AnnIngest.embedStub(col("text"), 64).as("embedding")),
      "doc_id", "embedding")

    def snap(dir: String) = graft.extra.AnnIndex.committedCodes(spark, dir)
      .select("id", "list_id", "codes", "v", "nrm")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getSeq[Any](2),
        r.getSeq[Any](3), r.getDouble(4)))
      .toSeq
    val streamed = snap(s"$base/streamed")
    assert(streamed == snap(s"$base/batch"))
    assert(streamed.map(_._1).toSet ==
      ((0L until 100L) ++ (1000L to 1009L)).toSet)
  }

  test("streaming BM25 ingest: N micro-batches ≡ one batch build — " +
      "searches bit-identical (no initial build needed)") {
    val base = Files.createTempDirectory("bm25_ingest").toString
    val batch1 = (0L to 4L).map(i => (i, s"$good alpha mark $i"))
    val batch2 = (5L to 9L).map(i => (i, s"$good beta mark $i"))

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = Files.createTempDirectory("bm25_ingest_ckpt").toString
    val q = AnnIngest.startBm25(CurationStream.curateStream(mem.toDF()),
      s"$base/streamed", ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(batch1.map { case (i, t) => payload(i, t, 1000000L + i) })
      q.processAllAvailable()
      mem.addData(batch2.map { case (i, t) => payload(i, t, 1100000L + i) })
      q.processAllAvailable()
    } finally q.stop()

    graft.extra.Bm25Index.build(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
      s"$base/batch")
    def hits(d: String) = graft.extra.Bm25Index.search(spark, d,
        Seq("alpha", "quick", "mark"), idCol = "doc_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val streamed = hits(s"$base/streamed")
    assert(streamed.nonEmpty && streamed == hits(s"$base/batch"))
  }

  test("exactly-once ANN ingest (r13 verdict #2): a crash-replayed " +
      "batchId leaves the index bit-identical — manifest version, " +
      "codes rows, and on-disk bytes unchanged") {
    val base = Files.createTempDirectory("ann_e1").toString
    val dir = s"$base/idx"
    val init = spark.range(100).select(col("id").as("doc_id"),
      AnnIngest.embedStub(concat(lit("seed doc "), col("id")), 64)
        .as("embedding"))
    AnnIndex.buildAndWriteIvfPq(init, "doc_id", "embedding", dir,
      numCentroids = 8, m = 8, pqCentroids = 8)               // v1
    val cb = AnnIndex.readCodebooks(spark, dir)
    def embBatch(ids: Seq[Long]) = ids.map(i => (i, s"$good mark $i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        AnnIngest.embedStub(col("text"), 64).as("embedding"))
    def state() = {
      val (v, entries) =
        (graft.extra.IndexManifests.latest(spark, dir).get._1,
          graft.extra.IndexManifests.latest(spark, dir).get._2)
      val rows = AnnIndex.committedCodes(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      (v, entries, rows)
    }
    // batch 0 applies; its replay is a no-op
    AnnIndex.appendIvfPq(spark, dir, embBatch(1000L to 1004L),
      "doc_id", "embedding", codebooks = Some(cb),
      txn = Some(("s1", 0L)))                                 // v2
    val afterFirst = state()
    AnnIndex.appendIvfPq(spark, dir, embBatch(1000L to 1004L),
      "doc_id", "embedding", codebooks = Some(cb),
      txn = Some(("s1", 0L)))                                 // replay
    assert(state() == afterFirst, "replayed batch mutated the index")
    // a batchId BELOW the ledger cannot be a replay (Spark re-offers
    // only the last committed batch) — it is a reset checkpoint
    // reusing its old path, and silently skipping would drop every
    // batch until the counter caught up (ADVICE r14): loud failure,
    // index untouched
    AnnIndex.appendIvfPq(spark, dir, embBatch(1005L to 1009L),
      "doc_id", "embedding", codebooks = Some(cb),
      txn = Some(("s1", 1L)))                                 // v3
    val afterSecond = state()
    val reset = intercept[IllegalStateException] {
      AnnIndex.appendIvfPq(spark, dir, embBatch(1000L to 1004L),
        "doc_id", "embedding", codebooks = Some(cb),
        txn = Some(("s1", 0L)))                               // reset
    }
    assert(reset.getMessage.contains("checkpoint"))
    assert(state() == afterSecond)
    assert(afterSecond._3.toSet ==
      ((0L until 100L) ++ (1000L to 1009L)).toSet)
    // a DIFFERENT stream's batch 0 is independent and applies
    AnnIndex.appendIvfPq(spark, dir, embBatch(2000L to 2001L),
      "doc_id", "embedding", codebooks = Some(cb),
      txn = Some(("s2", 0L)))                                 // v4
    assert(state()._3.toSet.contains(2000L))
    // the ledger survives compaction: replays still no-op after it
    AnnIndex.compact(spark, dir)
    val afterCompact = state()
    AnnIndex.appendIvfPq(spark, dir, embBatch(1005L to 1009L),
      "doc_id", "embedding", codebooks = Some(cb),
      txn = Some(("s1", 1L)))
    assert(state() == afterCompact,
      "replay after compact re-applied a committed batch")
  }

  test("exactly-once BM25 ingest: replayed batchId leaves searches " +
      "and the manifest unchanged") {
    val base = Files.createTempDirectory("bm25_e1").toString
    val dir = s"$base/idx"
    def docs(ids: Seq[Long], tag: String) =
      ids.map(i => (i, s"$good $tag mark $i")).toDF("doc_id", "text")
    graft.extra.Bm25Index.append(docs(0L to 4L, "alpha"), "doc_id",
      "text", dir, txn = Some(("b1", 0L)))
    def state() = {
      val v = graft.extra.IndexManifests.latest(spark, dir).get._1
      val h = graft.extra.Bm25Index.search(spark, dir,
          Seq("alpha", "mark"), idCol = "doc_id", topK = 10)
        .collect().map(_.toString).toSeq
      (v, h)
    }
    val after = state()
    graft.extra.Bm25Index.append(docs(0L to 4L, "alpha"), "doc_id",
      "text", dir, txn = Some(("b1", 0L)))                    // replay
    assert(state() == after,
      "replayed BM25 batch inflated tf/df/meta partials")
    // next batch applies; the stream path stamps the same ledger shape
    graft.extra.Bm25Index.append(docs(5L to 9L, "beta"), "doc_id",
      "text", dir, txn = Some(("b1", 1L)))
    assert(state()._1 == after._1 + 1)
  }
}
