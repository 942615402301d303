package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tick
import graft.ops.TickParse

/** Stream-static enrichment joins and append-mode (emit-once-final)
  * windowed aggregation — the remaining Structured Streaming classes.
  */
class StreamStaticSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static broadcast join enriches ticks with a dim table") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("AAPL", "tech", 100), ("MSFT", "tech", 200))
      .toDF("symbol", "sector", "lot_size")
    val in = MemoryStream[Tick]
    val enriched = TickParse.withEventTime(in.toDF())
      .join(broadcast(dim), Seq("symbol"), "left")
      .select("symbol", "price", "sector", "lot_size")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    in.addData(Tick("AAPL", 190.0, 1000L), Tick("UNKN", 1.0, 2000L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched_out").orderBy("symbol").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(2) == "tech")     // AAPL enriched
    assert(rows(1).isNullAt(2))                // UNKN left-join null
  }

  test("snapshot-dim enrichment picks up a new dim version at the " +
      "next trigger, without a stream restart") {
    import graft.extra.Snapshots
    import graft.streaming.SnapshotDim
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dimDir = java.nio.file.Files
      .createTempDirectory("snapdim").toString
    Snapshots.init(Seq((1L, "tech"), (2L, "energy"))
      .toDF("k", "sector"), dimDir, "k", 1)

    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val in = MemoryStream[Long]
    val ckpt = java.nio.file.Files
      .createTempDirectory("snapdim_ckpt").toString
    val q = SnapshotDim.start(in.toDF().toDF("k"), dimDir, Seq("k"),
      ckpt, batch => batch.collect().foreach(r =>
        out.add((r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))),
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(1L)
      q.processAllAvailable()
      // dim update commits a new snapshot version mid-stream
      Snapshots.upsert(spark, dimDir,
        Seq((1L, "fintech"), (3L, "retail")).toDF("k", "sector"), "k")
      in.addData(1L, 3L)
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = out.asScala.toSeq
    assert(got.contains((1L, "tech")))     // batch 1 saw v0
    assert(got.contains((1L, "fintech")))  // batch 2 saw v1
    assert(got.contains((3L, "retail")))   // including the new key
  }

  test("append-mode windowed agg emits each window once, only when closed") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val agg = TickParse.withEventTime(in.toDF())
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "60 seconds"), col("symbol"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("append_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    in.addData(Tick("AAPL", 1.0, 61000L))
    q.processAllAvailable()
    // window [60,120) still open: nothing emitted yet
    assert(spark.table("append_out").count() == 0L)
    // advance watermark past 120s -> window closes and emits ONCE, final
    in.addData(Tick("AAPL", 1.0, 140000L))
    q.processAllAvailable()
    in.addData(Tick("AAPL", 1.0, 300000L))
    q.processAllAvailable()
    q.stop()
    val w60 = spark.table("append_out")
      .filter(col("window.start") === lit("1970-01-01 00:01:00").cast("timestamp"))
      .collect()
    assert(w60.length == 1, "closed window emits exactly once")
    assert(w60.head.getAs[Long]("n") == 1L)
  }
}
