package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extra.{Stats, TimeSeries}

/** Hand-checked cases for exact quantiles and the interval join. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles matches the percentile_cont definition by hand") {
    // values 10,20,30,40 (n=4): p=0.5 -> pos 1.5 -> 25; p=0.25 -> 17.5;
    // p=1.0 -> 40; p=0.0 -> 10
    val df = Seq(10.0, 20.0, 30.0, 40.0).map(("k", _)).toDF("g", "v")
    val out = Stats.exactQuantiles(df, "g", "v",
        Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("p").collect().map(_.getAs[Double]("q")).toSeq
    assert(out == Seq(10.0, 17.5, 25.0, 40.0))
  }

  test("exactQuantiles handles n=1 groups and keeps keys separate") {
    val df = Seq(("a", 7.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val out = Stats.exactQuantiles(df, "g", "v", Seq(0.5))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Double]("q"))).toSeq ==
      Seq(("a", 7.0), ("b", 2.0)))
  }

  test("exactQuantiles agrees with Spark's percentile on a random set") {
    val vals = new scala.util.Random(42).shuffle((1 to 101).toList)
      .map(_.toDouble)
    val df = vals.map(("k", _)).toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.9)
    val ours = Stats.exactQuantiles(df, "g", "v", ps)
      .orderBy("p").collect().map(_.getAs[Double]("q")).toSeq
    val builtin = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .collect().head.getSeq[Double](1)
    assert(ours.zip(builtin).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("intervalJoin returns exactly the pairs within tolerance, once") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")),
      (1L, 11L, ts("2024-01-02 00:00:00")),
      (2L, 20L, ts("2024-01-01 12:00:00")))
      .toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 12:30:00")), // 30min from 10
      (1L, 101L, ts("2024-01-01 10:59:00")), // 61min from 10: out
      (1L, 102L, ts("2024-01-01 23:30:00")), // 30min from 11
      (2L, 200L, ts("2024-01-01 13:00:00")), // 60min from 20: boundary in
      (3L, 300L, ts("2024-01-01 12:00:00"))) // wrong key
      .toDF("k", "rid", "rts")
    val out = TimeSeries.intervalJoin(left, right, "k", "lts", "rts",
        toleranceSeconds = 3600L)
      .select("lid", "rid", "delta_us")
      .orderBy("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (10L, 100L, 30L * 60 * 1000000),
      (11L, 102L, -30L * 60 * 1000000),
      (20L, 200L, 3600L * 1000000)))
  }

  test("intervalJoin equals the naive cross-join formulation and is " +
      "partitioning-independent") {
    val rnd = new scala.util.Random(7)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      (rnd.nextInt(5).toLong, s"$tag$i",
        new Timestamp(1704067200000L + rnd.nextInt(500000) * 1000L))
    }.toDF("k", "id", "t")
    val a = mk(80, "a")
    val b = mk(80, "b").withColumnRenamed("id", "id2")
      .withColumnRenamed("t", "t2")
    val tol = 1800L
    val fast = TimeSeries.intervalJoin(a, b, "k", "t", "t2", tol)
      .select("id", "id2").orderBy("id", "id2").collect().toSeq
    val naive = a.join(b, Seq("k"))
      .filter(abs(unix_micros(col("t2")) - unix_micros(col("t"))) <=
        tol * 1000000L)
      .select("id", "id2").orderBy("id", "id2").collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
    val repart = TimeSeries.intervalJoin(
      a.repartition(13), b.repartition(3), "k", "t", "t2", tol)
      .select("id", "id2").orderBy("id", "id2").collect().toSeq
    assert(repart == naive)
  }

  // ---- 2-D skyline --------------------------------------------------

  test("skyline2d: hand-checked dominance incl. duplicate points and " +
      "same-cost strict domination; invariant to partitioning") {
    import graft.extra.Stats
    val rows = Seq(
      (1L, 1.0, 10),  // frontier: cheapest
      (2L, 2.0, 12),  // frontier: pricier but bigger
      (3L, 2.0, 11),  // dominated by id=2 (same price, bigger size)
      (4L, 3.0, 12),  // dominated by id=2 (cheaper, same size)
      (5L, 3.0, 15),  // frontier
      (6L, 4.0, 15),  // dominated by id=5
      (7L, 3.0, 15))  // duplicate of id=5 on both axes: BOTH stay
    val df = rows.toDF("id", "price", "size")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Stats.skyline2d(d, "price", "size").select("id").as[Long]
        .collect().sorted.toSeq
    assert(ids(df) == Seq(1L, 2L, 5L, 7L))
    assert(ids(df.repartition(5)) == Seq(1L, 2L, 5L, 7L))
  }

  test("withGlobalPrefixMax is EXCLUSIVE and equals the one-task " +
      "window form on a random frame") {
    import graft.ops.Ranks
    val df = (1 to 500).map(i => ((i * 37) % 101, (i * 13) % 97))
      .toDF("ord", "v")
    val got = Ranks.withGlobalPrefixMax(df,
        Seq(col("ord"), col("v")), col("v"), "pm")
      .select("ord", "v", "pm").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("ord", "v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm",
        coalesce(max(col("v").cast("long")).over(w), lit(Long.MinValue)))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == want)
  }

  // ---- Count-Min sketch ---------------------------------------------

  test("countMin: estimates never undercount, are exact when the " +
      "domain is collision-free, and the cell frame is bounded") {
    import graft.extra.Stats
    val keys = Seq.fill(40)(1L) ++ Seq.fill(7)(2L) ++ Seq(3L)
    val df = keys.toDF("k")
    val cells = Stats.countMinCells(df, "k", w = 64)
    assert(cells.count() <= 4L * 64)
    // sum per hash row equals the total count (nothing lost)
    val sums = cells.groupBy("j").agg(sum("c").as("s"))
      .select("s").as[Long].collect()
    assert(sums.toSeq == Seq.fill(4)(48L))
    val est = Stats.countMinEstimate(cells,
        Seq(1L, 2L, 3L, 999L).toDF("k"), "k", w = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est")).toMap
    // 3 distinct keys in 64 buckets x 4 independent rows: exact
    assert(est(1L) == 40L && est(2L) == 7L && est(3L) == 1L)
    assert(est(999L) >= 0L) // absent key: only collision mass
  }

  test("countMin: cells are additive (mergeable) and partitioning-" +
      "independent; a forced-collision domain overcounts, never under") {
    import graft.extra.Stats
    val keys = (0L until 500L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val df = keys.toDF("k")
    def cellMap(d: org.apache.spark.sql.DataFrame) =
      Stats.countMinCells(d, "k", w = 8).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cellMap(df)
    assert(cellMap(df.repartition(17)) == whole)
    // additivity: halves sum to the whole, cell by cell
    val h1 = cellMap(keys.take(700).toDF("k"))
    val h2 = cellMap(keys.drop(700).toDF("k"))
    val merged = (h1.keySet ++ h2.keySet)
      .map(c => c -> (h1.getOrElse(c, 0L) + h2.getOrElse(c, 0L))).toMap
    assert(merged == whole)
    // 500 keys into w=8: estimates collide hard but never undercount
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = Stats.countMinEstimate(Stats.countMinCells(df, "k", 8),
        keys.distinct.toDF("k"), "k", 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est")).toMap
    truth.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
  }
}
