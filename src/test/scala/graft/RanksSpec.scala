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

  test("ranking plan has no single-partition window") {
    val (ranked, _) = Ranks.withGlobalRowNumber(
      randomDf(100), Seq(col("v"), col("id")), "rk")
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
  }
}
