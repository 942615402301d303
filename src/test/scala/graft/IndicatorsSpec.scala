package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extra.Indicators

/** Hand-checked cases for the technical-indicator operators (the
  * oracle gate checks them at corpus scale; these pin the math on
  * series small enough to verify by eye).
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  /** One key, one observation per day with the given values. */
  private def series(vals: Seq[Double], key: String = "k") =
    vals.zipWithIndex
      .map { case (v, i) => (key, ts(i + 1), v) }
      .toDF("sym", "ts", "value")

  test("dailyMean averages within a day, DECIMAL-exact") {
    val df = Seq(
      ("k", ts(1, 9), 1.0), ("k", ts(1, 15), 2.0), ("k", ts(2), 10.0))
      .toDF("sym", "ts", "value")
    val out = Indicators.dailyMean(df, "sym", "ts", "value")
      .orderBy("day").collect()
    assert(out.map(_.getAs[Double]("px")).toSeq == Seq(1.5, 10.0))
    assert(out.map(_.getAs[Long]("n_obs")).toSeq == Seq(2L, 1L))
  }

  test("bollinger: constant series has sd 0 and bands equal to ma " +
      "after warmup; first day sd is NULL") {
    val out = Indicators.bollinger(series(Seq.fill(5)(10.0)),
        "sym", "ts", "value", windowDays = 3)
      .orderBy("day").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("sd"))) // n = 1
    val later = out.drop(1)
    assert(later.forall(_.getAs[Double]("sd") == 0.0))
    assert(later.forall(r => r.getAs[Double]("upper") == 10.0 &&
      r.getAs[Double]("lower") == 10.0 && r.getAs[Double]("ma") == 10.0))
    assert(out.map(_.getAs[Long]("n_days")).toSeq == Seq(1L, 2L, 3L, 3L, 3L))
  }

  test("bollinger matches a hand-computed window") {
    // values 1, 2, 3 with window 3: ma = 2, sample sd = 1
    val out = Indicators.bollinger(series(Seq(1.0, 2.0, 3.0)),
        "sym", "ts", "value", windowDays = 3, k = 2.0)
      .orderBy("day").collect().last
    assert(out.getAs[Double]("ma") == 2.0)
    assert(out.getAs[Double]("sd") == 1.0)
    assert(out.getAs[Double]("upper") == 4.0)
    assert(out.getAs[Double]("lower") == 0.0)
  }

  test("rsi pins to 100 on all-gains, 0 on all-losses, NULL in warmup") {
    val up = Indicators.rsi(series((1 to 6).map(_.toDouble)),
        "sym", "ts", "value", windowDays = 3)
      .orderBy("day").collect()
    // days 1-3 have < 3 diffs in frame -> NULL; days 4+ all-gain -> 100
    assert(up.take(3).forall(_.isNullAt(3)))
    assert(up.drop(3).forall(_.getAs[Double]("rsi") == 100.0))
    val down = Indicators.rsi(series((1 to 6).map(i => 10.0 - i)),
        "sym", "ts", "value", windowDays = 3)
      .orderBy("day").collect()
    assert(down.drop(3).forall(_.getAs[Double]("rsi") == 0.0))
  }

  test("rsi matches a hand-computed mixed window") {
    // diffs over (10, 12, 11, 14): +2, -1, +3; window 3 at the last day:
    // gain = 5, loss = 1, rs = 5, rsi = 100 - 100/6
    val out = Indicators.rsi(series(Seq(10.0, 12.0, 11.0, 14.0)),
        "sym", "ts", "value", windowDays = 3)
      .orderBy("day").collect().last
    assert(out.getAs[Double]("rsi") ==
      math.rint((100.0 - 100.0 / 6.0) * 1e6) / 1e6)
  }

  test("ewma: first value passes through; recurrence matches by hand") {
    val out = Indicators.ewma(series(Seq(10.0, 20.0, 30.0)),
        "sym", "ts", "value", alpha = 0.5)
      .orderBy("day").collect()
    assert(out.map(_.getAs[Double]("ewma")).toSeq == Seq(10.0, 15.0, 22.5))
  }

  test("cusum: a planted level shift raises the positive arm past the " +
      "threshold and alarms; the flat prefix stays silent") {
    // 12 flat days, then a +big shift held for 8 days: z is strongly
    // positive after the shift, S+ accumulates ~(z-0.5)/day and must
    // cross 4.0 within the shifted block; the negative arm never fires
    val vals = Seq.fill(12)(10.0) ++ Seq.fill(8)(20.0)
    val out = Indicators.cusum(series(vals), "sym", "ts", "value")
      .orderBy("day").collect()
    val alarms = out.map(r => r.getAs[Boolean]("alarm")).toSeq
    assert(!alarms.take(12).exists(identity),
      s"flat prefix alarmed: $alarms")
    assert(alarms.drop(12).exists(identity),
      s"shift never alarmed: $alarms")
    assert(out.forall(_.getAs[Double]("cusum_neg") <= 4.0))
    // monotone accumulation inside the shifted block until saturation
    val spTail = out.drop(12).map(_.getAs[Double]("cusum_pos")).toSeq
    assert(spTail == spTail.sorted, s"S+ not accumulating: $spTail")
  }

  test("cusum: constant series standardizes to z = 0 and never alarms") {
    val out = Indicators.cusum(series(Seq.fill(10)(7.0)), "sym", "ts",
      "value").collect()
    assert(out.forall(r => r.getAs[Double]("z") == 0.0 &&
      !r.getAs[Boolean]("alarm")))
    assert(out.forall(r => r.getAs[Double]("cusum_pos") == 0.0 &&
      r.getAs[Double]("cusum_neg") == 0.0))
  }

  test("indicators are independent of input partitioning and keep " +
      "keys separate") {
    val twoKeys = series((1 to 10).map(i => i * 1.7), "a")
      .union(series((1 to 10).map(i => 100.0 - 3 * i), "b"))
    def run(df: org.apache.spark.sql.DataFrame) = (
      Indicators.bollinger(df, "sym", "ts", "value", 3)
        .orderBy("sym", "day").collect().toSeq,
      Indicators.rsi(df, "sym", "ts", "value", 3)
        .orderBy("sym", "day").collect().toSeq,
      Indicators.ewma(df, "sym", "ts", "value", 0.3)
        .orderBy("sym", "day").collect().toSeq)
    val base = run(twoKeys)
    assert(run(twoKeys.repartition(7)) == base)
    assert(run(twoKeys.repartition(1)) == base)
    // keys never bleed: key b's series equals running key b alone
    val bAlone = Indicators.ewma(series((1 to 10).map(i => 100.0 - 3 * i),
      "b"), "sym", "ts", "value", 0.3).orderBy("day").collect().toSeq
    assert(base._3.filter(_.getString(0) == "b").map(_.getDouble(3)) ==
      bAlone.map(_.getDouble(3)))
  }
}
