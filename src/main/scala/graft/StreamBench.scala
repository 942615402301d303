package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{RateTickSource, StreamingPipeline}

/** Streaming parity micro-bench (BASELINE.md): drive the flagship
  * pipeline from the rate source at a target ticks/sec, report sustained
  * throughput and micro-batch latency as one JSON line.
  *
  * Usage: runMain graft.StreamBench [tps] [seconds]
  */
object StreamBench {

  final case class StreamStats(
      eventsPerSec: Double,
      targetTps: Int,
      rows: Long,
      wallS: Double,
      nBatches: Int,
      avgBatchMs: Double,
      maxBatchMs: Long) {
    def json: String =
      s"""{"events_per_sec":$eventsPerSec,"target_tps":$targetTps,""" +
        s""""rows":$rows,"wall_s":$wallS,"n_batches":$nBatches,""" +
        s""""avg_batch_ms":$avgBatchMs,"max_batch_ms":$maxBatchMs}"""
  }

  /** Run the flagship streaming pipeline for `secs` wall-clock seconds at
    * `tps` generated ticks/sec and collect throughput + per-micro-batch
    * latency. Shared by the standalone main and [[Bench]]'s streaming
    * block, so batch and streaming regressions surface in the same
    * artifact.
    */
  def measure(spark: SparkSession, tps: Int, secs: Int): StreamStats = {
    val out = Files.createTempDirectory("sbench_out").toString
    val ckpt = Files.createTempDirectory("sbench_ckpt").toString
    val src = new RateTickSource(tps, Seq("AAPL", "MSFT", "GOOG"))
    val q = StreamingPipeline.start(spark, src,
      StreamingPipeline.Config(window = "60 seconds", slide = "10 seconds",
        lateness = "60 seconds", checkpointDir = ckpt, outDir = out),
      trigger = Trigger.ProcessingTime(0))
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < secs) Thread.sleep(200)
    val progress = q.recentProgress.toSeq
    q.stop()
    val rows = progress.map(_.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val batchMs = progress.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong))
    val avgBatchMs =
      if (batchMs.nonEmpty) batchMs.sum.toDouble / batchMs.size else -1.0
    val maxBatchMs = if (batchMs.nonEmpty) batchMs.max else -1L
    StreamStats(rows / wall, tps, rows, wall, batchMs.size, avgBatchMs,
      maxBatchMs)
  }

  def main(args: Array[String]): Unit = {
    val tps = args.headOption.map(_.toInt).getOrElse(1000)
    val secs = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = measure(spark, tps, secs)
    println(s"""{"metric":"stream_throughput","events_per_sec":${s.eventsPerSec},""" +
      s""""target_tps":${s.targetTps},"rows":${s.rows},"wall_s":${s.wallS},""" +
      s""""n_batches":${s.nBatches},"avg_batch_ms":${s.avgBatchMs},""" +
      s""""max_batch_ms":${s.maxBatchMs}}""")
    spark.stop()
  }
}
