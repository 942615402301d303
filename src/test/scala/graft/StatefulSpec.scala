package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tick
import graft.streaming.{FileTickSource, Stateful, StreamingPipeline}

/** Custom keyed state (flatMapGroupsWithState) + file source coverage. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("EMA state carries across micro-batches per symbol") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.emaPerSymbol(in.toDS(), alpha = 0.5)
      .writeStream.outputMode("update")
      .format("memory").queryName("ema_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    in.addData(Tick("AAPL", 100.0, 1000L), Tick("AAPL", 110.0, 2000L))
    q.processAllAvailable()
    in.addData(Tick("AAPL", 120.0, 3000L), Tick("MSFT", 400.0, 3000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ema_out")
      .groupBy("symbol").agg(max(struct(col("n_ticks"), col("ema"))).as("s"))
      .select(col("symbol"), col("s.ema"), col("s.n_ticks"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // AAPL: ema after 100,110 = 105; after 120: 0.5*120+0.5*105 = 112.5
    assert(out("AAPL") == ((112.5, 3L)))
    assert(out("MSFT") == ((400.0, 1L)))
  }

  test("EMA is arrival-order independent inside a batch (event-time sort)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.emaPerSymbol(in.toDS(), alpha = 0.5)
      .writeStream.outputMode("update")
      .format("memory").queryName("ema_ooo")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // reversed arrival order; event-time order is 100 then 110
    in.addData(Tick("X", 110.0, 2000L), Tick("X", 100.0, 1000L))
    q.processAllAvailable(); q.stop()
    val ema = spark.table("ema_ooo").select("ema").as[Double].collect().head
    assert(ema == 105.0)
  }

  test("streaming as-of: trades carry last quote, state crosses batches") {
    import graft.streaming.Stateful.AsOfEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[AsOfEvent]
    val q = Stateful.asofPerKey(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1, arrival order scrambled: the trade at t=2000 must see the
    // t=1500 quote (not the t=3000 one); the t=500 trade precedes any
    // quote; the t=3000 trade ties the t=3000 quote → matched
    in.addData(
      AsOfEvent("A", "trade", 10.0, 2000L),
      AsOfEvent("A", "quote", 99.0, 3000L),
      AsOfEvent("A", "quote", 98.0, 1500L),
      AsOfEvent("A", "trade", 11.0, 500L),
      AsOfEvent("A", "trade", 12.0, 3000L))
    q.processAllAvailable()
    // batch 2: state carries — a trade with no new quote sees t=3000's
    in.addData(AsOfEvent("A", "trade", 13.0, 9000L),
      AsOfEvent("B", "trade", 50.0, 9000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_out")
      .select("key", "event_time_ms", "asof_value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("A", 500L)).isEmpty)
    assert(out(("A", 2000L)).contains(98.0))
    assert(out(("A", 3000L)).contains(99.0))
    assert(out(("A", 9000L)).contains(99.0))
    assert(out(("B", 9000L)).isEmpty)
  }

  test("streaming anomalies: warmup is silent, the planted outlier " +
      "fires, state carries across batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.anomaliesPerSymbol(in.toDS(), k = 4.0, minObs = 10L)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1: 10 well-behaved ticks around 100 (warmup exactly met)
    in.addData((1 to 10).map(i =>
      Tick("X", 100.0 + (i % 3) - 1, i * 1000L)): _*)
    q.processAllAvailable()
    // batch 2: one normal tick and one wild outlier
    in.addData(Tick("X", 100.0, 11000L), Tick("X", 500.0, 12000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("anom_out").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("price") == 500.0)
    assert(r.getAs[Long]("n_seen") == 11L)
    assert(r.getAs[Double]("zscore") > 4.0)
  }

  test("streaming anomalies: a level shift stops alarming once absorbed " +
      "into the state") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.anomaliesPerSymbol(in.toDS(), k = 3.0, minObs = 5L)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_shift")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    in.addData((1 to 6).map(i =>
      Tick("Y", 10.0 + (i % 2), i * 1000L)): _*)
    q.processAllAvailable()
    // jump to a new level and stay there
    in.addData((7 to 30).map(i => Tick("Y", 50.0, i * 1000L)): _*)
    q.processAllAvailable()
    q.stop()
    val fired = spark.table("anom_shift").select("event_time_ms")
      .as[Long].collect().sorted
    // the first post-shift ticks alarm, but not all 24: the shift is
    // absorbed and later 50.0 ticks are inliers again
    assert(fired.nonEmpty && fired.head == 7000L)
    assert(fired.length < 24)
  }

  test("streaming CUSUM: a sustained small drift the point fence " +
      "never sees accumulates to an alarm; stationary data is silent") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.cusumPerSymbol(in.toDS(), slack = 0.5,
      threshold = 4.0, minObs = 10L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // warmup: alternating ±1 around 100 → sd ≈ 1, mean ≈ 100
    in.addData((1 to 10).map(i =>
      Tick("D", 100.0 + (if (i % 2 == 0) 1.0 else -1.0), i * 1000L)): _*)
    q.processAllAvailable()
    // stationary continuation: S arms stay under water (|z| ≈ 1 vs
    // slack 0.5 alternates signs, never accumulates to 4)
    in.addData((11 to 20).map(i =>
      Tick("D", 100.0 + (if (i % 2 == 0) 1.0 else -1.0), i * 1000L)): _*)
    q.processAllAvailable()
    assert(spark.table("cusum_out").count() == 0)
    // sustained +2 drift: z ≈ +2 each tick → S+ grows ~1.5/tick and
    // must cross 4.0 within a few ticks — a 4σ point fence never fires
    in.addData((21 to 30).map(i => Tick("D", 102.0, i * 1000L)): _*)
    q.processAllAvailable()
    q.stop()
    val alarms = spark.table("cusum_out")
      .orderBy("event_time_ms").collect()
    assert(alarms.nonEmpty, "drift never alarmed")
    val first = alarms.head
    assert(first.getAs[Double]("cusum_pos") > 4.0)
    assert(first.getAs[Long]("event_time_ms") >= 21000L)
    assert(first.getAs[Double]("z") < 4.0,
      "drift ticks must be sub-point-fence z scores")
    // post-alarm reset: the NEXT alarm (if any) is at least a few
    // ticks later, not every subsequent observation
    if (alarms.length > 1)
      assert(alarms(1).getAs[Long]("event_time_ms") >=
        first.getAs[Long]("event_time_ms") + 2000L)
  }

  test("streaming CUSUM state carries across batches: the drift can " +
      "start in one batch and alarm in a later one") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = Stateful.cusumPerSymbol(in.toDS(), slack = 0.5,
      threshold = 4.0, minObs = 10L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_xbatch")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    in.addData((1 to 10).map(i =>
      Tick("E", 100.0 + (if (i % 2 == 0) 1.0 else -1.0), i * 1000L)): _*)
    q.processAllAvailable()
    // two drift ticks: not enough to alarm yet (S+ ≈ 3)
    in.addData(Tick("E", 102.0, 11000L), Tick("E", 102.0, 12000L))
    q.processAllAvailable()
    assert(spark.table("cusum_xbatch").count() == 0)
    // next batch continues the accumulation and crosses
    in.addData(Tick("E", 102.0, 13000L), Tick("E", 102.0, 14000L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("cusum_xbatch").count() >= 1)
  }

  test("CUSUM streaming-vs-batch differential (r13 verdict #5): on a " +
      "long stationary series both arms agree on every day; under a " +
      "planted shift the first alarm days sit within 3 days") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    // one observation per day, 120 days: the daily series the batch
    // operator folds IS the tick series the streaming operator sees,
    // so the only deviations left are the documented ones (online vs
    // full-series moments; post-alarm reset)
    def px(i: Int, shifted: Boolean): Double =
      if (shifted && i >= 100) 102.5
      else 100.0 + ((i * 37) % 7 - 3) * 0.5
    def batchDays(shifted: Boolean): Seq[Int] = {
      val df = (0 until 120).map { i =>
        ("K", java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
            .atStartOfDay()), px(i, shifted))
      }.toDF("symbol", "ts", "price")
      graft.extra.Indicators.cusum(df, "symbol", "ts", "price",
          slack = 0.5, threshold = 4.0)
        .filter(col("alarm"))
        .select(expr("datediff(day, DATE'2024-01-01')").cast("int"))
        .as[Int].collect().toSeq.sorted
    }
    def streamDays(shifted: Boolean): Seq[Int] = {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[Tick]
      val name = s"cusum_diff_${if (shifted) "s" else "q"}"
      val q = Stateful.cusumPerSymbol(in.toDS(), slack = 0.5,
        threshold = 4.0, minObs = 30L)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      // three batches so the state demonstrably crosses batch bounds
      Seq(0 until 40, 40 until 80, 80 until 120).foreach { rng =>
        in.addData(rng.map(i =>
          Tick("K", px(i, shifted), i * 86400000L)): _*)
        q.processAllAvailable()
      }
      q.stop()
      spark.table(name)
        .select((col("event_time_ms") / lit(86400000L)).cast("int"))
        .as[Int].collect().toSeq.sorted
    }
    // stationary: ZERO disagreement days (the bound the scaladoc's
    // "documented deviations" must not exceed here: both silent)
    assert(batchDays(shifted = false).isEmpty)
    assert(streamDays(shifted = false).isEmpty)
    // planted +2.3σ shift at day 100: both arms alarm, first alarms
    // within 3 days (simulated: batch day 103, streaming day 102);
    // every pre-shift day still agrees (silent) in both arms
    val b = batchDays(shifted = true)
    val s = streamDays(shifted = true)
    assert(b.nonEmpty && s.nonEmpty)
    assert(b.head >= 100 && s.head >= 100,
      s"pre-shift false alarm: batch=$b stream=$s")
    assert(math.abs(b.head - s.head) <= 3,
      s"first-alarm gap: batch=${b.head} stream=${s.head}")
  }

  test("silence alerts: a quiet symbol fires once when the watermark " +
      "passes its deadline; live symbols stay silent; state is removed") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Tick]
    val ticks = Stateful.withEventTimeWatermark(in.toDS(), "0 seconds")
    val q = Stateful.silenceAlerts(ticks, silenceMs = 10000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("silence_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1: A and B both ticking
    in.addData(Tick("A", 1.0, 1000L), Tick("A", 1.1, 5000L),
      Tick("B", 2.0, 5000L))
    q.processAllAvailable()
    // batch 2: only B ticks on, far past A's 15s deadline — advances
    // the watermark; the timeout fires on the NEXT trigger
    in.addData(Tick("B", 2.1, 100000L))
    q.processAllAvailable()
    in.addData(Tick("B", 2.2, 110000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("silence_out").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A")
    assert(r.getAs[Long]("last_event_ms") == 5000L)
    assert(r.getAs[Long]("n_ticks") == 2L)
  }

  test("file source drives the flagship pipeline end-to-end") {
    val in = Files.createTempDirectory("filesrc").toString
    val out = Files.createTempDirectory("out").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    Files.writeString(java.nio.file.Path.of(in, "batch1.json"),
      """{"value":"{\"symbol\":\"AAPL\",\"price\":100.0,\"event_time_ms\":61000}"}
        |{"value":"{\"symbol\":\"AAPL\",\"price\":105.0,\"event_time_ms\":95000}"}
        |""".stripMargin)
    val q = StreamingPipeline.start(spark, new FileTickSource(in),
      StreamingPipeline.Config("60 seconds", "60 seconds", "60 seconds",
        ckpt, out), trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    val fin = StreamingPipeline.finalized(spark, out)
      .filter(col("window_start") === lit("1970-01-01 00:01:00").cast("timestamp"))
      .collect()
    assert(fin.length == 1)
    assert(fin.head.getAs[Long]("num_ticks") == 2L)
    assert(fin.head.getAs[Double]("last_price") == 105.0)
    assert(fin.head.getAs[Long]("latency_ms") > 0L)
  }

  test("streaming CEP: a partial match crosses micro-batches, emits on " +
      "completion, and matches the batch operator on a timeout-free " +
      "fixture") {
    import Stateful.CepEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CepEvent]
    val q = Stateful.cepPerKey(in.toDS(), Seq("a", "b", "c"),
        withinMs = 1000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // batch 1 opens a partial (a, skip x, b) — nothing emits yet
    in.addData(CepEvent("u1", 0L, 0L, "a"), CepEvent("u1", 1L, 1L, "x"),
      CepEvent("u1", 2L, 2L, "b"))
    q.processAllAvailable()
    assert(spark.table("cep_out").count() == 0)
    // batch 2 closes it; a second full run in one batch also emits
    in.addData(CepEvent("u1", 3L, 3L, "c"),
      CepEvent("u2", 0L, 0L, "a"), CepEvent("u2", 1L, 1L, "b"),
      CepEvent("u2", 2L, 2L, "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cep_out").collect()
      .map(m => (m.getString(0), m.getAs[Long]("start_ms"),
        m.getAs[Long]("end_ms"), m.getAs[Int]("n_skipped"))).toSet
    assert(got == Set(("u1", 0L, 3L, 1), ("u2", 0L, 2L, 0)))
    // timeout-free fixture ⇒ identical to the batch skip-till-next
    val batch = graft.extra.Cep.matchSkipTillNext(
      Seq(("u1", 0L, 0L, "a"), ("u1", 1L, 1L, "x"), ("u1", 2L, 2L, "b"),
        ("u1", 3L, 3L, "c"), ("u2", 0L, 0L, "a"), ("u2", 1L, 1L, "b"),
        ("u2", 2L, 2L, "c"))
        .toDF("key", "ms", "id", "typ")
        .select(xxhash64(col("key")).as("k"),
          timestamp_millis(col("ms")).as("ts"), col("id"), col("typ")),
      "k", "ts", "typ", Seq("a", "b", "c"), 1000000L, "id")
      .collect().map(m => (m.match_start.getTime, m.match_end.getTime,
        m.n_skipped)).toSet
    assert(batch == got.map(g => (g._2, g._3, g._4)))
  }

  test("streaming CEP: an expired partial abandons and the next event " +
      "can open a fresh match immediately") {
    import Stateful.CepEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CepEvent]
    val q = Stateful.cepPerKey(in.toDS(), Seq("a", "b"), withinMs = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_to")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    in.addData(
      CepEvent("k", 0L, 0L, "a"),     // partial opens
      CepEvent("k", 500L, 1L, "a"),   // first partial expired; reopens here
      CepEvent("k", 550L, 2L, "b"))   // closes the second
    q.processAllAvailable(); q.stop()
    val out = spark.table("cep_to").collect()
      .map(m => (m.getAs[Long]("start_ms"), m.getAs[Long]("end_ms")))
    assert(out.toSeq == Seq((500L, 550L)))
  }
}
