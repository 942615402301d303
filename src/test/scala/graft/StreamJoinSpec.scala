package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tick
import graft.ops.TickParse

/** Stream-stream interval join with watermarks on both sides — the
  * Structured Streaming join class the engine must support beyond the
  * reference's single-stream surface (e.g., trades ⋈ quotes within a
  * time bound).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("trades join clicks stream-stream within a 60s interval per symbol") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val trades = MemoryStream[Tick]
    val quotes = MemoryStream[Tick]
    val t = TickParse.withEventTime(trades.toDF())
      .withWatermark("event_time", "1 minute")
      .select(col("symbol"), col("price").as("trade_price"),
        col("event_time").as("trade_time"))
    val q = TickParse.withEventTime(quotes.toDF())
      .withWatermark("event_time", "1 minute")
      .select(col("symbol").as("q_symbol"), col("price").as("quote_price"),
        col("event_time").as("quote_time"))
    val joined = t.join(q,
      col("symbol") === col("q_symbol") &&
        col("quote_time") >= col("trade_time") - expr("interval 60 seconds") &&
        col("quote_time") <= col("trade_time"))
      .select("symbol", "trade_price", "quote_price")
    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.ProcessingTime(0)).start()

    trades.addData(Tick("AAPL", 101.0, 120000L))
    quotes.addData(
      Tick("AAPL", 100.5, 90000L),   // within 60s before: matches
      Tick("AAPL", 99.0, 30000L),    // too old: no match
      Tick("MSFT", 400.0, 120000L))  // wrong symbol: no match
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("ssj_out")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("AAPL", 101.0, 100.5)))
  }
}
