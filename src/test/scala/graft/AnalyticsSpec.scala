package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extra.Analytics

/** Hand-checked cases for the market-analytics operators (VWAP,
  * drawdown, pair correlation, gap fill, MAD fences). The oracle gate
  * checks them at corpus scale; these pin the math on series small
  * enough to verify by eye.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("vwap weights by qty within the day") {
    // day 1: (10 @ qty 1, 20 @ qty 3) -> (10 + 60) / 4 = 17.5
    val df = Seq(
      ("k", ts(1, 9), 10.0, 1L), ("k", ts(1, 15), 20.0, 3L),
      ("k", ts(2), 5.0, 2L))
      .toDF("sym", "ts", "px", "qty")
    val out = Analytics.vwap(df, "sym", "ts", "px", "qty")
      .orderBy("day").collect()
    assert(out.map(_.getAs[Double]("vwap")).toSeq == Seq(17.5, 5.0))
    assert(out.map(_.getAs[Long]("total_qty")).toSeq == Seq(4L, 2L))
  }

  test("maxDrawdown finds the deepest peak-to-trough drop") {
    // daily series 10, 8, 12, 6: peak 12 -> trough 6 = 50% relative
    val df = Seq(10.0, 8.0, 12.0, 6.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }
      .toDF("sym", "ts", "value")
    val row = Analytics.maxDrawdown(df, "sym", "ts", "value")
      .collect().head
    assert(row.getAs[Double]("max_drawdown") == 0.5)
    assert(row.getAs[Double]("max_abs_drawdown") == 6.0)
    assert(row.getAs[Long]("n_days") == 4L)
  }

  test("maxDrawdown: monotone rise has zero drawdown; non-positive " +
      "peak yields NULL relative drawdown") {
    val rise = Seq(1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }
      .toDF("sym", "ts", "value")
    val r = Analytics.maxDrawdown(rise, "sym", "ts", "value")
      .collect().head
    assert(r.getAs[Double]("max_drawdown") == 0.0)

    val neg = Seq(-1.0, -2.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }
      .toDF("sym", "ts", "value")
    val n = Analytics.maxDrawdown(neg, "sym", "ts", "value")
      .collect().head
    assert(n.isNullAt(n.fieldIndex("max_drawdown")))
    // absolute drawdown still defined: peak -1 -> -2 is a drop of 1
    assert(n.getAs[Double]("max_abs_drawdown") == 1.0)
  }

  test("pairCorrelation: perfectly linear pair -> 1, anti-linear -> -1") {
    // hourly buckets shared by construction (same timestamps per key)
    val rows = (1 to 4).flatMap { h =>
      Seq(("a", ts(1, h), h.toDouble),
        ("b", ts(1, h), 2.0 * h + 1),      // corr(a,b) = 1
        ("c", ts(1, h), -3.0 * h))         // corr(a,c) = corr(b,c) = -1
    }
    val out = Analytics.pairCorrelation(rows.toDF("sym", "ts", "value"),
        "sym", "ts", "value")
      .orderBy("k1", "k2").collect()
    assert(out.map(r => (r.getString(0), r.getString(1),
      r.getAs[Double]("corr"))).toSeq ==
      Seq(("a", "b", 1.0), ("a", "c", -1.0), ("b", "c", -1.0)))
    assert(out.forall(_.getAs[Long]("n_buckets") == 4L))
  }

  test("pairCorrelation: zero-variance side emits NULL, not NaN") {
    val rows = (1 to 3).flatMap { h =>
      Seq(("a", ts(1, h), h.toDouble), ("flat", ts(1, h), 7.0))
    }
    val r = Analytics.pairCorrelation(rows.toDF("sym", "ts", "value"),
        "sym", "ts", "value").collect().head
    assert(r.isNullAt(r.fieldIndex("corr")))
  }

  test("gapFill carries the last observation across missing buckets " +
      "and flags them") {
    // observations at hours 1 and 4 -> grid 1..4, hours 2,3 are gaps
    val df = Seq(
      ("k", ts(1, 1), 10.0, 1L),
      ("k", ts(1, 4), 40.0, 2L))
      .toDF("sym", "ts", "value", "id")
    val out = Analytics.gapFill(df, "sym", "ts", "value", "id")
      .orderBy("bucket").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Double]("filled")).toSeq ==
      Seq(10.0, 10.0, 10.0, 40.0))
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ==
      Seq(false, true, true, false))
  }

  test("gapFill picks the LAST observation within a bucket, ties by " +
      "the tie column") {
    val sameHour = Seq(
      ("k", Timestamp.valueOf("2024-01-01 01:10:00"), 1.0, 5L),
      ("k", Timestamp.valueOf("2024-01-01 01:50:00"), 2.0, 1L),
      // same ts as the 2.0 row: higher id wins
      ("k", Timestamp.valueOf("2024-01-01 01:50:00"), 3.0, 9L))
      .toDF("sym", "ts", "value", "id")
    val out = Analytics.gapFill(sameHour, "sym", "ts", "value", "id")
      .collect()
    assert(out.length == 1 && out.head.getAs[Double]("filled") == 3.0)
  }

  test("anomalyMad flags exactly the planted outliers") {
    // 20 inliers around 10 (dev <= 1) + 2 wild outliers
    val vals = (1 to 20).map(i => 10.0 + (i % 3) - 1) ++ Seq(1000.0, -500.0)
    val df = vals.map(("k", _)).toDF("sym", "value")
    val r = Analytics.anomalyMad(df, "sym", "value", k = 5.0)
      .collect().head
    assert(r.getAs[Long]("n") == 22L)
    assert(r.getAs[Long]("n_anomalies") == 2L)
    assert(r.getAs[Double]("med") == 10.0)
  }

  test("categoryEntropy: uniform 4 types = 2 bits, single type = 0") {
    val rows = (1 to 4).map(i => ("u1", s"t$i")) ++
      Seq.fill(5)(("u2", "only"))
    val out = Analytics.categoryEntropy(rows.toDF("u", "cat"), "u", "cat")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_cats"),
          r.getAs[Double]("entropy"))).toMap
    assert(out("u1") == ((4L, 4L, 2.0)))
    assert(out("u2") == ((5L, 1L, 0.0)))
  }

  test("histogram: bins are equi-width, the max closes into the last " +
      "bin, and counts sum to the row count") {
    val df = (0 to 100).map(v => ("k", v.toDouble)).toDF("g", "v")
    val out = Analytics.histogram(df, "g", "v", bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    assert(out.map(_.getAs[Long]("cnt")).sum == 101L)
    // v=100 (the max) falls in bin 9, not a phantom bin 10
    assert(out.last.getAs[Long]("cnt") == 11L)
    assert(out.head.getAs[Double]("lo") == 0.0)
    assert(out.last.getAs[Double]("hi") == 100.0)
  }

  test("histogram: constant key collapses to a single bin 0") {
    val df = Seq.fill(7)(("k", 3.0)).toDF("g", "v")
    val out = Analytics.histogram(df, "g", "v").collect()
    assert(out.length == 1 && out.head.getAs[Long]("bin") == 0L &&
      out.head.getAs[Long]("cnt") == 7L)
  }

  test("welchTTest: identical variants give t=0-ish; a shifted variant " +
      "gives a large negative t; degenerate sides give NULL") {
    val same = (1 to 40).map(i => ("k", i % 2, 10.0 + (i % 5)))
      .toDF("g", "variant", "v")
    val t0 = Analytics.welchTTest(same, "g", "variant", "v")
      .collect().head.getAs[Double]("t_stat")
    assert(math.abs(t0) < 0.5)

    val shifted = (1 to 40).map { i =>
      val variant = i % 2
      ("k", variant, if (variant == 1) 100.0 + (i % 5) else 10.0 + (i % 5))
    }.toDF("g", "variant", "v")
    val t1 = Analytics.welchTTest(shifted, "g", "variant", "v")
      .collect().head.getAs[Double]("t_stat")
    assert(t1 < -50.0, s"expected strongly negative t, got $t1")

    val oneSide = Seq(("k", 0, 1.0), ("k", 0, 2.0)).toDF("g", "variant", "v")
    val r = Analytics.welchTTest(oneSide, "g", "variant", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("t_stat")))
  }

  test("autocorrelation: a monotone ramp is ~1, an alternating series " +
      "is strongly negative, constant is NULL") {
    def series(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("g", "ts", "v")
    val ramp = Analytics.autocorrelation(
      series((1 to 20).map(_.toDouble)), "g", "ts", "v")
      .collect().head.getAs[Double]("autocorr")
    assert(ramp > 0.95, s"ramp autocorr $ramp")
    val alt = Analytics.autocorrelation(
      series((1 to 20).map(i => if (i % 2 == 0) 10.0 else -10.0)),
      "g", "ts", "v").collect().head.getAs[Double]("autocorr")
    assert(alt < -0.95, s"alternating autocorr $alt")
    val const = Analytics.autocorrelation(
      series(Seq.fill(10)(5.0)), "g", "ts", "v").collect().head
    assert(const.isNullAt(const.fieldIndex("autocorr")))
  }

  test("rollingCorrelation: linear pair locks to 1 after warmup; " +
      "anti-correlated flips to -1; first row is NULL (n=1)") {
    val rows = (1 to 30).flatMap { h =>
      val x = (h % 7).toDouble
      Seq(("A", ts(1 + h / 24, h % 24), x),
        ("B", ts(1 + h / 24, h % 24), 3 * x + 2))
    }.toDF("sym", "ts", "v")
    val out = Analytics.rollingCorrelation(rows, "sym", "ts", "v",
      Seq(("A", "B")), windowN = 6).orderBy("bucket").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("corr")))
    assert(out.drop(6).forall(_.getAs[Double]("corr") == 1.0))
  }

  test("olsTrend recovers an exact linear daily series") {
    // px = 5 + 2*dayIndex exactly
    val rows = (0 until 10).map(d => ("k", ts(d + 1), 5.0 + 2.0 * d))
      .toDF("g", "ts", "v")
    val r = Analytics.olsTrend(rows, "g", "ts", "v").collect().head
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 5.0)
    assert(r.getAs[Long]("n_days") == 10L)
  }

  test("invariants on real data: entropy bounded by log2(n_cats), " +
      "histogram counts conserve rows, vwap partition-invariant") {
    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .withColumn("qty", (col("event_id") % 10 + 1).cast("long"))
    Analytics.categoryEntropy(ev, "user_id", "event_type")
      .collect().foreach { r =>
        val (h, cats) = (r.getAs[Double]("entropy"), r.getAs[Long]("n_cats"))
        assert(h >= 0.0 && h <= math.log(cats.toDouble) / math.log(2.0) + 1e-6,
          s"entropy $h outside [0, log2($cats)]")
      }
    val histTotal = Analytics.histogram(ev, "event_type", "value")
      .agg(sum("cnt")).head.getLong(0)
    assert(histTotal == ev.count())
    val a = Analytics.vwap(ev, "event_type", "ts", "value", "qty")
      .collect().map(_.toString).sorted
    val b = Analytics.vwap(ev.repartition(17), "event_type", "ts",
      "value", "qty").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("funnel: stage order is strict — an out-of-order event does " +
      "not convert; latencies are exact") {
    val t0 = ts(1, 1)
    val rows = Seq(
      // u1 converts fully: view@1h, click@2h, buy@3h
      (1L, "view", ts(1, 1)), (1L, "click", ts(1, 2)),
      (1L, "buy", ts(1, 3)),
      // u2 clicked BEFORE viewing: click@1h, view@2h -> stuck at view
      (2L, "click", ts(1, 1)), (2L, "view", ts(1, 2)),
      // u3 views only
      (3L, "view", ts(1, 5)))
      .toDF("uid", "etype", "ts")
    val out = Analytics.funnel(rows, "uid", "ts", "etype",
      Seq("view", "click", "buy")).collect()
    val byStage = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_users"),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(byStage("1_view") == ((3L, None)))
    assert(byStage("2_click") == ((1L, Some(3600.0))))
    assert(byStage("3_buy") == ((1L, Some(3600.0))))
  }

  test("funnel: 10+ stages come back in NUMERIC stage order, not " +
      "lexicographic label order") {
    // "10_s10" sorts lexicographically before "2_s2"; the output must
    // still run 1..12 because ordering is by the numeric stage index.
    val stages = (1 to 12).map(i => s"s$i")
    val rows = (1 to 12).flatMap { i =>
      // user 1 passes every stage in order; user 2 stops after s3
      Seq((1L, s"s$i", ts(1, i))) ++
        (if (i <= 3) Seq((2L, s"s$i", ts(1, i))) else Nil)
    }.toDF("uid", "etype", "ts")
    val out = Analytics.funnel(rows, "uid", "ts", "etype", stages)
    assert(out.columns.toSeq ==
      Seq("stage", "n_users", "avg_step_seconds"))
    val labels = out.collect().map(_.getString(0)).toSeq
    assert(labels == (1 to 12).map(i => s"${i}_s$i"),
      s"stage order must be numeric, got $labels")
    val users = out.collect().map(_.getAs[Long]("n_users")).toSeq
    assert(users == Seq(2L, 2L, 2L) ++ Seq.fill(9)(1L))
  }

  test("cohortRetention: offsets count distinct active users from the " +
      "first-seen day") {
    val rows = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(4)),
      (2L, ts(2)), (2L, ts(4)))
      .toDF("uid", "ts")
    val out = Analytics.cohortRetention(rows, "uid", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 3) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 2) -> 1L))
  }

  test("anomalyMadApprox tracks the exact twin on real data (high-" +
      "accuracy sketch: identical medians, identical anomaly counts)") {
    val ev = graft.model.Tables.load(spark, sfDir, "events")
    val exact = Analytics.anomalyMad(ev, "event_type", "value")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("med"), r.getAs[Long]("n_anomalies"))).toMap
    val approx = Analytics.anomalyMadApprox(ev, "event_type", "value")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("med"), r.getAs[Long]("n_anomalies"))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (key, (med, nAnom)) =>
      val (amed, aAnom) = approx(key)
      // at accuracy 10000 over ~1-2k rows/key the sketch is exact or
      // one neighbor off; fences are 5*MAD wide so counts agree
      assert(math.abs(amed - med) <= math.abs(med) * 0.01 + 0.5,
        s"$key: approx med $amed vs exact $med")
      assert(aAnom == nAnom, s"$key: approx anomalies $aAnom vs $nAnom")
    }
  }

  test("anomalyMad: constant series has MAD 0 and every unequal row " +
      "is an anomaly") {
    val df = (Seq.fill(10)(5.0) :+ 5.1).map(("k", _)).toDF("sym", "value")
    val r = Analytics.anomalyMad(df, "sym", "value").collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_anomalies") == 1L)
  }
}
