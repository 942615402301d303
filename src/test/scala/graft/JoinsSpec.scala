package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** Bloom-prefiltered join: bit-parity with the plain join (false
  * positives must be re-verified away), real pre-shuffle row reduction,
  * and the soundness guards.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = spark.range(20000)
    .select(col("id"), (col("id") % 997).as("k"),
      (col("id") * 3 % 101).cast("double").as("v"))
  // 1% of the key space
  private lazy val small = spark.range(10)
    .select((col("id") * 100 % 997).as("k"),
      concat(lit("dim-"), col("id")).as("name"))

  test("inner join parity with the plain join (exact same rows)") {
    val got = Joins.bloomPrefilteredJoin(big, Seq("k"), small, Seq("k"),
      expectedKeys = 1024)
      .select("id", "v", "name")
    val want = big.join(small, big("k") === small("k"))
      .select(big("id"), col("v"), col("name"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() == want.count())
  }

  test("left_semi parity; multi-column keys") {
    val b2 = big.withColumn("k2", col("k") % 7)
    val s2 = small.withColumn("k2", col("k") % 7)
    // default expectedKeys=0 exercises the auto-sizing count() path
    val got = Joins.bloomPrefilteredJoin(b2, Seq("k", "k2"),
      s2, Seq("k", "k2"), joinType = "left_semi")
    val want = b2.join(s2,
      b2("k") === s2("k") && b2("k2") === s2("k2"), "left_semi")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("the prefilter drops the non-matching bulk before the shuffle " +
      "(survivors ≈ matching rows, ≪ big)") {
    val bloom = Joins.keyBloom(small, Seq(small("k")), 1024,
      Joins.optimalNumBits(1024, 0.01))
    val survivors = big.filter(
      Joins.mightContain(bloom, Seq(big("k")))).count()
    val matching = big.join(small.select("k").distinct(), Seq("k"),
      "left_semi").count()
    val total = big.count()
    assert(survivors >= matching, s"$survivors < $matching — bloom " +
      "must never drop a true match")
    // 1% fpp on ~20k probes admits ~200 false positives
    assert(survivors <= matching + total / 20,
      s"survivors=$survivors matching=$matching total=$total")
  }

  test("outer join types are rejected; mismatched key types are " +
      "rejected") {
    intercept[IllegalArgumentException] {
      Joins.bloomPrefilteredJoin(big, Seq("k"), small, Seq("k"),
        joinType = "left_outer")
    }
    val smallInt = small.withColumn("k", col("k").cast("int"))
    intercept[IllegalArgumentException] {
      Joins.bloomPrefilteredJoin(big, Seq("k"), smallInt, Seq("k"))
    }
  }

  test("the probe plans as a might_contain filter below the join") {
    val plan = Joins.bloomPrefilteredJoin(big, Seq("k"), small, Seq("k"),
      expectedKeys = 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }
}
