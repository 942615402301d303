package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CurationStream

/** Streaming curation: quality/lang gates + watermark exact-dedup on a
  * replayed memory stream.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs to the old stone bridge in light rain"

  private def payload(id: Long, text: String, tMs: Long): String =
    s"""{"doc_id":$id,"text":"$text","event_time_ms":$tMs}"""

  test("gates junk, drops in-flight duplicates, keeps the first copy") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Files.createTempDirectory("cur_stream_out").toString
    val ckpt = Files.createTempDirectory("cur_stream_ckpt").toString
    mem.addData(Seq(
      payload(1, good, 1000000L),
      payload(2, good, 1005000L),          // exact dup inside watermark
      payload(3, "too short to keep", 1010000L), // quality gate
      payload(4, good + " extra", 1020000L)))    // distinct text: kept
    val q = CurationStream.curateStream(mem.toDF())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
    q.awaitTermination(60000)
    val rows = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 4L))
  }

  test("near-dup suppression drops cross-micro-batch near copies, " +
      "keeps distinct docs, and bounds state by the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Files.createTempDirectory("cur_nd_out").toString
    val ckpt = Files.createTempDirectory("cur_nd_ckpt").toString
    val nearCopy = good.replace("lazy", "sleepy") // one token differs
    // distinct content, but stopword-rich enough to pass the same
    // quality/language gates the other fixtures pass
    val distinct =
      "the silver wolf walks under a bright moon of winter to find " +
        "the hidden creek in deep snow and drinks in the cold night"
    val q = CurationStream.curateStreamNearDup(mem.toDF())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
    // batch 1: original + a distinct doc
    mem.addData(Seq(
      payload(1, good, 1000000L),
      payload(2, distinct, 1001000L)))
    // batch 2 (separate micro-batch): near copy of doc 1 — its band
    // buckets are already claimed by doc 1's state, so it must drop even
    // though the exact text differs (text_hash dedup would keep it)
    mem.addData(Seq(
      payload(3, nearCopy, 1002000L)))
    // batch 3: watermark pusher — event_time one hour later closes the
    // earlier emit windows (its own window stays open and unemitted)
    mem.addData(Seq(
      payload(9, good + " flush marker row", 4600000L)))
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L))
  }

  test("near-dup suppression in the SAME micro-batch keeps exactly the " +
      "min-doc_id copy (deterministic intra-batch bucket ownership)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Files.createTempDirectory("cur_sb_out").toString
    val ckpt = Files.createTempDirectory("cur_sb_ckpt").toString
    val nearCopy = good.replace("lazy", "sleepy")
    val q = CurationStream.curateStreamNearDup(mem.toDF())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
    // ONE micro-batch carrying an original and its near copy: before
    // the intra-batch combine, dropDuplicates could split band wins
    // between docs 5 and 7 so NEITHER reached the full band count and
    // the content vanished. Deterministic ownership must keep exactly
    // doc 5 (the min doc_id of the colliding pair). No exact copy in
    // the fixture: the upstream text_hash dedup picks its own winner
    // among identical texts, which would make the surviving id ambiguous.
    mem.addData(Seq(
      payload(7, nearCopy, 1002000L),
      payload(5, good, 1000000L)))
    // watermark pusher in a later batch to close the emit window
    mem.addData(Seq(
      payload(9, good + " flush marker row", 4600000L)))
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(5L))
  }

  test("classifyStream: frozen-model verdicts on a stream are " +
      "bit-identical to the batch scorer; keep-filter and gates " +
      "compose; stateless (no watermark, append mode)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // stopword-rich fixtures that pass the quality/lang gates
    val keepA = good + " across the stone bridge near the river bank"
    val keepB = good + " and the walk continues along the river path"
    val dropA = good + " buy cheap pills now with this exclusive offer"
    val dropB = good + " cheap pills and a limited offer for you today"
    val model = graft.extra.Classifier.trainNaiveBayes(
      Seq((1L, "keep", keepA), (2L, "keep", keepB),
        (3L, "drop", dropA), (4L, "drop", dropB))
        .toDF("doc_id", "label", "text"),
      "label", "text")
    val mem = MemoryStream[String]
    val out = Files.createTempDirectory("cur_cls_out").toString
    val ckpt = Files.createTempDirectory("cur_cls_ckpt").toString
    val scoreKeep = good + " the stone bridge over the river"
    val scoreDrop = good + " cheap pills offer"
    mem.addData(Seq(
      payload(10, scoreKeep, 1000000L),
      payload(11, scoreDrop, 1001000L),
      payload(12, "too short to keep", 1002000L))) // gate, not model
    val q = CurationStream.classifyStream(mem.toDF(), model,
        keep = Some(Set("keep")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
    q.awaitTermination(60000)
    val rows = spark.read.parquet(out)
      .select("doc_id", "predicted", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows.map(_._1) == Seq(10L))
    assert(rows.head._2 == "keep")
    // the streamed score equals the batch scorer's on the same text —
    // the frozen model serves both paths identically
    val batch = graft.extra.Classifier.predictNaiveBayes(
      Seq((10L, scoreKeep)).toDF("doc_id", "text"), "doc_id", "text",
      model).collect().head
    assert(batch.getString(1) == "keep")
    assert(rows.head._3 == batch.getDouble(2))
  }

  test("streaming minhash signature projection agrees with the batch " +
      "groupBy signature on the same text") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, good), (2L, good + " tail"), (3L, "tiny"))
      .toDF("doc_id", "text")
    val streaming = docs
      .withColumn("mhs",
        graft.extra.Dedup.minhashArray(
          graft.extra.Text.shingles(col("text"), 3), 8))
      .select(col("doc_id"), posexplode(col("mhs")).as(Seq("i", "mh")))
    val batch = graft.extra.Dedup.minhash(docs, "doc_id", "text",
        numPerms = 8, shingleN = 3)
      .select(col("doc_id"),
        posexplode(array((0 until 8).map(i => col(s"mh$i")): _*))
          .as(Seq("i", "mh")))
    // doc 3 has no 3-shingles: batch drops it, streaming emits the
    // sentinel — compare only docs present in both
    val s = streaming.filter(col("doc_id") =!= 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(b.nonEmpty && s == b)
    val sentinel = streaming.filter(col("doc_id") === 3)
      .select("mh").as[Long].collect()
    assert(sentinel.length == 8 &&
      sentinel.forall(_ == graft.extra.Dedup.MinhashP))
  }
}
