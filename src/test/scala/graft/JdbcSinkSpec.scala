package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row

import graft.streaming.JdbcSink

/** The distributed warehouse sink: per-partition writers, bounded batch
  * sizes, no driver funnel. A recording writer stands in for the JDBC
  * driver (none ships in this environment); in local mode executor
  * threads share the JVM, so a static queue observes executor-side calls.
  */
object RecordingWriters {
  // (partitionId, batchRowCount) per writeBatch call; partitionId -1 = close
  val calls = new ConcurrentLinkedQueue[(Int, Int)]()
  val threads = new ConcurrentLinkedQueue[String]()

  class Factory extends JdbcSink.BatchWriterFactory {
    override def open(partitionId: Int, batchId: Long): JdbcSink.RowBatchWriter =
      new JdbcSink.RowBatchWriter {
        override def writeBatch(rows: Seq[Row]): Unit = {
          calls.add((partitionId, rows.size))
          threads.add(Thread.currentThread().getName)
        }
        override def close(): Unit = calls.add((partitionId, -1))
      }
  }
}

class JdbcSinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("writePartitioned batches executor-side per partition, no driver funnel") {
    RecordingWriters.calls.clear()
    RecordingWriters.threads.clear()
    val df = spark.range(0, 1000).repartition(4).toDF("id")
    JdbcSink.writePartitioned(df, batchId = 7L, batchSize = 64,
      new RecordingWriters.Factory)

    val calls = RecordingWriters.calls.asScala.toSeq
    val writes = calls.filter(_._2 >= 0)
    val closes = calls.filter(_._2 == -1)
    // all 1000 rows arrived, in batches never exceeding batchSize
    assert(writes.map(_._2).sum == 1000)
    assert(writes.forall(_._2 <= 64), writes.filter(_._2 > 64).toString)
    // work fanned out across partitions, one close per partition
    assert(writes.map(_._1).distinct.size == 4)
    assert(closes.map(_._1).distinct.size == 4)
    // batching ran on executor task threads, not the driver thread
    assert(RecordingWriters.threads.asScala.forall(_.contains("Executor task launch")),
      RecordingWriters.threads.asScala.toSet.toString)
  }

  test("foreachBatchSink adapts writePartitioned to the foreachBatch signature") {
    RecordingWriters.calls.clear()
    val sink = JdbcSink.foreachBatchSink(10, new RecordingWriters.Factory)
    sink(spark.range(0, 25).repartition(1).toDF("id"), 0L)
    val writes = RecordingWriters.calls.asScala.filter(_._2 >= 0)
    assert(writes.map(_._2).sum == 25)
    // 25 rows at batchSize 10 → 10+10+5
    assert(writes.map(_._2).toSeq.sorted == Seq(5, 10, 10))
  }

  test("rejects non-positive batch size") {
    intercept[IllegalArgumentException] {
      JdbcSink.writePartitioned(spark.range(1).toDF("id"), 0L, 0,
        new RecordingWriters.Factory)
    }
  }

  test("features DDL covers every sink column of the streaming pipeline") {
    for (c <- Seq("symbol", "window_start", "window_end", "first_price",
        "last_price", "log_return", "volatility", "num_ticks",
        "max_event_time_ms", "ingest_ts", "latency_ms"))
      assert(JdbcSink.FeaturesTableDdl.contains(c), c)
  }
}
