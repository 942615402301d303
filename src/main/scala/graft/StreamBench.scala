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
    println(s"""{"metric":"stream_throughput","events_per_sec":${rows / wall},
      |"target_tps":$tps,"rows":$rows,"wall_s":$wall,
      |"n_batches":${batchMs.size},"avg_batch_ms":$avgBatchMs,
      |"max_batch_ms":$maxBatchMs}""".stripMargin.replace("\n", ""))
    spark.stop()
  }
}
