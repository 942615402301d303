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
}
