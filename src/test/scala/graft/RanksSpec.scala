package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranks

/** Distributed global ranking must agree exactly with the builtin
  * single-partition window functions it replaces.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(n: Int) =
    spark.range(n)
      .withColumn("v", pmod(xxhash64(col("id")), lit(997L)))
      .repartition(7) // deliberately not range-partitioned on v

  test("withGlobalRowNumber matches row_number over a global window") {
    val df = randomDf(5000)
    val (ranked, total) = Ranks.withGlobalRowNumber(
      df, Seq(col("v"), col("id")), "rk")
    assert(total == 5000L)
    val viaWindow = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(ranked.orderBy("id").collect().toSeq ==
      viaWindow.orderBy("id").collect().toSeq)
  }

  test("withGlobalPrefixSum matches SUM() OVER a global order and is " +
      "partitioning-independent") {
    val df = randomDf(5000)
    val summed = Ranks.withGlobalPrefixSum(
      df, Seq(col("v"), col("id")), col("v") + 1L, "cum")
    val viaWindow = df.withColumn("cum",
      sum(col("v") + 1L).over(
        Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(summed.orderBy("id").collect().toSeq ==
      viaWindow.orderBy("id").collect().toSeq)
    val rep = Ranks.withGlobalPrefixSum(
      df.repartition(13), Seq(col("v"), col("id")), col("v") + 1L, "cum")
    assert(rep.orderBy("id").collect().toSeq ==
      summed.orderBy("id").collect().toSeq)
  }

  test("withNtile matches ntile over a global window for awkward n/k") {
    for ((n, k) <- Seq((5000, 10), (5003, 7), (10, 3), (4, 10), (1, 5))) {
      val df = randomDf(n)
      val ours = Ranks.withNtile(df, Seq(col("v"), col("id")), k, "t")
        .orderBy("id").select("t").as[Int].collect().toSeq
      val builtin = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .orderBy("id").select("t").as[Int].collect().toSeq
      assert(ours == builtin, s"mismatch at n=$n k=$k")
    }
  }

  test("withNtile bucket sizes differ by at most one") {
    val sizes = Ranks.withNtile(randomDf(5003), Seq(col("v"), col("id")), 7, "t")
      .groupBy("t").count().select("count").as[Long].collect()
    assert(sizes.max - sizes.min <= 1)
  }

  test("withGroupedNtile matches ntile over a per-group window: uneven " +
      "group sizes, a group smaller than the bucket count, a null " +
      "group, awkward n/k — across partitionings") {
    // groups of very different sizes; group D has 2 rows (< k buckets);
    // one row's group is NULL (its own partition, like SQL)
    val df = spark.range(3000).select(col("id"),
        when(pmod(col("id"), lit(100L)) === 0L, lit(null))
          .otherwise(concat(lit("g"),
            pmod(xxhash64(col("id")), lit(4L)))).as("grp"),
        pmod(xxhash64(col("id") + 7L), lit(31L)).as("v"))
      .union(Seq((100001L, "gD", 5L), (100002L, "gD", 3L))
        .toDF("id", "grp", "v"))
      .repartition(7)
    for (k <- Seq(3, 7)) {
      val builtin = df.withColumn("t", ntile(k).over(
          Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))))
        .orderBy("id").select("id", "t").collect().toSeq
      for (parts <- Seq(1, 5, 32)) {
        val ours = Ranks.withGroupedNtile(df.repartition(parts),
            Seq("grp"), Seq(col("v"), col("id")), k, "t")
          .orderBy("id").select("id", "t").collect().toSeq
        assert(ours == builtin, s"mismatch at k=$k parts=$parts")
      }
    }
    // plan shape: no window operator anywhere
    val tiled = Ranks.withGroupedNtile(df, Seq("grp"),
      Seq(col("v"), col("id")), 3, "t")
    tiled.count()
    assert(!tiled.queryExecution.executedPlan.toString.contains("Window"))
    intercept[IllegalArgumentException] {
      Ranks.withGroupedNtile(df, Nil, Seq(col("v")), 3, "t")
    }
  }

  test("withGroupedRowNumber matches row_number + count over a " +
      "per-group window, totals included") {
    val df = spark.range(2000).select(col("id"),
        pmod(xxhash64(col("id")), lit(5L)).cast("string").as("grp"),
        pmod(xxhash64(col("id") + 3L), lit(101L)).as("v"))
      .repartition(9)
    val ours = Ranks.withGroupedRowNumber(df, Seq("grp"),
        Seq(col("v"), col("id")), "rk", totalOut = Some("n"))
      .orderBy("id").collect().toSeq
    val viaWindow = df
      .withColumn("rk", row_number().over(Window.partitionBy("grp")
        .orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy("grp")))
      .orderBy("id").collect().toSeq
    assert(ours == viaWindow)
  }

  test("withGroupedRowNumber: the many-groups fallback (maxGroups " +
      "exceeded) takes the window form with identical values; binary " +
      "and ±0.0 group keys group like SQL PARTITION BY") {
    val df = spark.range(500).select(col("id"),
        pmod(xxhash64(col("id")), lit(50L)).cast("string").as("grp"),
        pmod(xxhash64(col("id") + 1L), lit(13L)).as("v"))
      .repartition(5)
    val twoPass = Ranks.withGroupedRowNumber(df, Seq("grp"),
        Seq(col("v"), col("id")), "rk", totalOut = Some("n"))
      .orderBy("id").collect().toSeq
    // 50 groups > maxGroups = 3 → the window fallback, same values
    val viaFallback = Ranks.withGroupedRowNumber(df, Seq("grp"),
        Seq(col("v"), col("id")), "rk", totalOut = Some("n"),
        maxGroups = 3L)
      .orderBy("id").collect().toSeq
    assert(viaFallback == twoPass)
    // BinaryType group: identity-equality Arrays would split every row
    // into its own run (and crash pass 2's map lookup); normalized
    // keys must reproduce the window's SQL grouping
    val bin = spark.range(300).select(col("id"),
        md5(pmod(col("id"), lit(4L)).cast("string")).cast("binary")
          .as("grp"),
        pmod(xxhash64(col("id")), lit(7L)).as("v"))
      .repartition(4)
    val binOurs = Ranks.withGroupedRowNumber(bin, Seq("grp"),
        Seq(col("v"), col("id")), "rk")
      .orderBy("id").select("id", "rk").collect().toSeq
    val binWin = bin.withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("v"), col("id")))
        .cast("long"))
      .orderBy("id").select("id", "rk").collect().toSeq
    assert(binOurs == binWin)
    // the ntile arithmetic over the fallback's (rank, total) columns
    // must equal builtin ntile too — the fallback regime is otherwise
    // only reachable past 100k real groups
    val ntFallback = Ranks.withGroupedNtile(df, Seq("grp"),
        Seq(col("v"), col("id")), 4, "t", maxGroups = 3L)
      .orderBy("id").select("id", "t").collect().toSeq
    val ntWin = df.withColumn("t", ntile(4).over(
        Window.partitionBy("grp").orderBy(col("v"), col("id"))))
      .orderBy("id").select("id", "t").collect().toSeq
    assert(ntFallback == ntWin)
    // ±0.0 double group keys collapse to one group, like SQL
    val zeros = Seq((1L, 0.0d, 5L), (2L, -0.0d, 3L), (3L, 1.5d, 4L),
        (4L, -0.0d, 1L)).toDF("id", "grp", "v").repartition(3)
    val zOurs = Ranks.withGroupedRowNumber(zeros, Seq("grp"),
        Seq(col("v"), col("id")), "rk", totalOut = Some("n"))
      .orderBy("id").select("id", "rk", "n").collect().toSeq
    val zWin = zeros
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("v"), col("id")))
        .cast("long"))
      .withColumn("n", count(lit(1L)).over(Window.partitionBy("grp")))
      .orderBy("id").select("id", "rk", "n").collect().toSeq
    assert(zOurs == zWin)
  }

  test("withGroupedPrefixSum matches SUM() OVER a per-group order " +
      "across partitionings; the maxGroups fallback agrees; a NULL " +
      "value fails loudly in BOTH regimes") {
    val df = spark.range(2000).select(col("id"),
        pmod(xxhash64(col("id")), lit(6L)).cast("string").as("grp"),
        pmod(xxhash64(col("id") + 9L), lit(97L)).as("v"))
      .repartition(7)
    val viaWindow = df.withColumn("cum",
        sum(col("v") + 1L).over(Window.partitionBy("grp")
          .orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("id").collect().toSeq
    for (parts <- Seq(1, 4, 32)) {
      val ours = Ranks.withGroupedPrefixSum(df.repartition(parts),
          Seq("grp"), Seq(col("v"), col("id")), col("v") + 1L, "cum")
        .orderBy("id").collect().toSeq
      assert(ours == viaWindow, s"mismatch at parts=$parts")
    }
    val fb = Ranks.withGroupedPrefixSum(df, Seq("grp"),
        Seq(col("v"), col("id")), col("v") + 1L, "cum", maxGroups = 2L)
      .orderBy("id").collect().toSeq
    assert(fb == viaWindow)
    // NULL valueOf: loud contract error, two-pass AND window regimes
    val withNull = df.withColumn("nv",
      when(col("id") === 7L, lit(null)).otherwise(col("v")))
    for (mg <- Seq(100000L, 2L)) {
      val e = intercept[Exception] {
        // consume `cum` explicitly: a count() prunes the guarded
        // column away in the lazy window regime
        Ranks.withGroupedPrefixSum(withNull, Seq("grp"),
          Seq(col("v"), col("id")), col("nv"), "cum", maxGroups = mg)
          .agg(sum(col("cum"))).head()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("withGroupedPrefixSum")), e)
    }
  }

  test("ranking plan has no single-partition window") {
    val (ranked, _) = Ranks.withGlobalRowNumber(
      randomDf(100), Seq(col("v"), col("id")), "rk")
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
  }
}
