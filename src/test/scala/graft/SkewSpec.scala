package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted two-phase aggregation / salted join equal their direct forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount equals direct groupBy count under heavy skew") {
    val df = (Seq.fill(5000)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .toDF("k", "i")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedCount(df, Seq("k"), 8, col("i"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals direct join") {
    val left = (Seq.fill(2000)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .toDF("k", "i")
    val right = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "v")
    val direct = left.join(right, Seq("k"))
      .orderBy("k", "i").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), 8, col("i"))
      .orderBy("k", "i").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(salted == direct)
  }
}
