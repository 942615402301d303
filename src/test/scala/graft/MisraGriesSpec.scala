package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Misra-Gries mergeable heavy-hitter summary: the two textbook bounds
  * under forced multi-partition merges, and the two-pass exact
  * operator's parity + partitioning independence.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skew: item "h<i>" for i in 0..9 appears ~(10-i)·400
    * times, plus a long tail of singletons — planted heavy hitters
    * over a noisy background.
    */
  private lazy val skewed = {
    val heads = (0 until 10).flatMap(i =>
      Seq.fill((10 - i) * 400)(s"h$i"))
    val tail = (0 until 8000).map(i => s"t$i")
    val rnd = new scala.util.Random(7L)
    rnd.shuffle(heads ++ tail).toDF("item").repartition(13)
  }

  test("sketch bounds: est ≤ true ≤ est + n/(k+1); every item above " +
      "n/(k+1) is present — across 13-partition merges") {
    val k = 50
    val mg = MisraGries.sketch(skewed, "item", k)
    val truth = skewed.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    assert(mg.n == n)
    val slack = n.toDouble / (k + 1)
    mg.items.foreach { case (item, est) =>
      val t = truth.getOrElse(item, 0L)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(t <= est + slack, s"$item bound broken: $t > $est + $slack")
    }
    truth.filter(_._2 > slack).keys.foreach { hh =>
      assert(mg.items.contains(hh), s"guaranteed heavy hitter $hh missing")
    }
    assert(mg.items.size <= k)
  }

  test("exactHeavyHitters == direct GROUP BY ... HAVING, and is " +
      "partitioning-independent") {
    val share = 0.02
    def direct(df: org.apache.spark.sql.DataFrame) = {
      val n = df.count()
      df.groupBy("item").agg(count(lit(1)).as("n"))
        .filter(col("n") > share * n)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    }
    val want = direct(skewed)
    assert(want.nonEmpty)
    val got1 = MisraGries.exactHeavyHitters(skewed, "item", share)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val got13 = MisraGries
      .exactHeavyHitters(skewed.repartition(1), "item", share)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got1 == want)
    assert(got13 == want)
  }

  test("guards: k too small for the share is rejected; NULL items are " +
      "skipped; non-string column is cast") {
    intercept[IllegalArgumentException] {
      MisraGries.exactHeavyHitters(skewed, "item", 0.1, k = 5)
    }
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("item")
    val mg = MisraGries.sketch(withNulls, "item", 8)
    assert(mg.n == 3 && mg.items("a") == 2)
    val nums = Seq(1, 1, 1, 2).toDF("item")
    assert(MisraGries.sketch(nums, "item", 8).items("1") == 3)
  }
}
