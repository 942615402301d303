package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tick
import graft.ops.TickParse

/** Remaining streaming operator classes: exactly-once stream dedup
  * within the watermark, and streaming session_window aggregation.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dropDuplicatesWithinWatermark removes replayed ticks") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val deduped = TickParse.withEventTime(in.toDF())
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("symbol", "event_time_ms")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    in.addData(Tick("AAPL", 100.0, 60000L), Tick("AAPL", 100.0, 60000L))
    q.processAllAvailable()
    in.addData(Tick("AAPL", 100.0, 60000L),   // replay in later batch
      Tick("AAPL", 101.0, 61000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream")
    assert(out.count() == 2L, "duplicates within watermark must collapse")
  }

  test("streaming session_window aggregation closes sessions after watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val sessions = TickParse.withEventTime(in.toDF())
      .withWatermark("event_time", "10 seconds")
      .groupBy(session_window(col("event_time"), "30 seconds"), col("symbol"))
      .agg(count(lit(1)).as("n"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("session_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    // session 1: two events 5s apart; then a gap > 30s; watermark advance
    in.addData(Tick("AAPL", 1.0, 10000L), Tick("AAPL", 1.0, 15000L))
    q.processAllAvailable()
    in.addData(Tick("AAPL", 1.0, 100000L))  // new session, wm -> 90s
    q.processAllAvailable()
    in.addData(Tick("AAPL", 1.0, 200000L))  // wm -> 190s closes session 2
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("session_stream")
      .select(col("session_window.start").cast("long"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // closed sessions: [10,45) with 2 events and [100,130) with 1
    assert(rows.contains((10L, 2L)))
    assert(rows.contains((100L, 1L)))
  }

  test("Monitor listener captures per-batch progress as a DataFrame") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mon = new graft.streaming.Monitor().attach(spark)
    try {
      val in = MemoryStream[Tick]
      val q = TickParse.withEventTime(in.toDF())
        .groupBy("symbol").count()
        .writeStream.outputMode("update")
        .format("memory").queryName("mon_out")
        .trigger(Trigger.ProcessingTime(0)).start()
      in.addData(Tick("AAPL", 1.0, 1000L), Tick("MSFT", 2.0, 2000L))
      q.processAllAvailable()
      q.stop()
      // listener events are async; wait for delivery
      var tries = 0
      while (mon.snapshot.forall(_.num_input_rows == 0) && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val df = mon.asDataFrame(spark)
      assert(df.filter(col("num_input_rows") === 2L).count() >= 1,
        s"expected a 2-row batch in ${mon.snapshot}")
    } finally mon.detach(spark)
  }
}
