package graft

import org.apache.spark.sql.functions._

import graft.extra.Sampling

/** Deterministic sampling: identical selections at any partitioning —
  * the property rand(seed)-based sampling does NOT have.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is identical across partitionings") {
    val df = spark.range(2000).toDF("id")
    def assign(parts: Int) =
      Sampling.withSplit(df.repartition(parts), "id")
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(1) == assign(13))
    val m = assign(7)
    val frac = m.values.count(_ == "train").toDouble / m.size
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac")
  }

  test("deterministic sample is stable and approximately sized") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(17), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 800 && a.size < 1200, s"sample size ${a.size}")
    // monotone: smaller fraction is a subset of larger
    val c = Sampling.deterministicSample(df, "id", 0.05)
      .select("id").as[Long].collect().toSet
    assert(c.subsetOf(a))
  }
}
