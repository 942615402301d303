package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the Spark-native form of the reference's
  * dashboard KPIs (rows ingested, throughput, batch latency; reference
  * streamlit_app.py:53-64). A [[StreamingQueryListener]] accumulates
  * per-batch progress; [[asDataFrame]] exposes it as a queryable frame
  * so the serving queries (KPI, recent slice) run over live metrics the
  * same way they run over the feature sink.
  *
  * Driver-side by design: progress events are tiny (one row per
  * micro-batch), nothing here touches executor data paths.
  */
object Monitor {
  final case class BatchProgress(
      query_name: String, batch_id: Long, num_input_rows: Long,
      input_rows_per_second: Double, process_rows_per_second: Double,
      batch_duration_ms: Long, event_time_watermark: String,
      // Late-data observability (SURVEY §4.3): rows silently discarded
      // by stateful operators because they arrived behind the
      // watermark, summed over the batch's state operators. The
      // flagship pipeline DROPS late ticks by design (watermark
      // semantics); this surfaces how many, per batch, so an ops
      // dashboard can alarm on late-data spikes instead of inferring
      // them from row-count gaps.
      rows_dropped_by_watermark: Long = 0L)
}

final class Monitor extends StreamingQueryListener {
  import Monitor.BatchProgress

  private val buf = mutable.ArrayBuffer.empty[BatchProgress]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    buf += BatchProgress(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.inputRowsPerSecond,
      p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
      Option(p.eventTime.get("watermark")).getOrElse(""),
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum)
  }

  def snapshot: Seq[BatchProgress] = synchronized(buf.toSeq)

  def asDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }

  def attach(spark: SparkSession): Monitor = {
    spark.streams.addListener(this); this
  }
  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
