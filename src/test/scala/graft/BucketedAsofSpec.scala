package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.extra.TimeSeries

/** Skew-safe bucketed as-of join: result equality with the plain keyed
  * form on skewed fixtures, and the plan-shape guarantee that a hot key
  * is spread over more than one partition (clustering on (key, bucket),
  * not key alone).
  */
class BucketedAsofSpec extends SparkSpec {
  import spark.implicits._

  // one hypertraded key (0) carrying ~90% of rows + two cold keys;
  // right timestamps unique per key so as-of matches are unambiguous
  // and the two implementations must agree EXACTLY
  private def fixture = {
    val rnd = new Random(7)
    val hotT = rnd.shuffle((0L until 50000L by 7L).toVector).take(900)
    val coldT = rnd.shuffle((3L until 50000L by 11L).toVector).take(60)
    val leftRows =
      hotT.take(450).zipWithIndex.map { case (t, i) => (0L, t, i.toLong) } ++
        coldT.take(30).zipWithIndex.map { case (t, i) =>
          (1L + i % 2, t, 1000L + i)
        }
    val rightRows =
      hotT.drop(450).map(t => (0L, t, t * 0.5)) ++
        coldT.drop(30).map(t => (1L + t % 2, t, t * 0.25))
    val left = leftRows.toDF("k", "t", "lid")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val right = rightRows.toDF("k", "t", "v")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    (left, right)
  }

  test("bucketed as-of equals the plain form on a skewed fixture " +
      "(both directions, with/without tolerance)") {
    val (left, right) = fixture
    for {
      dir <- Seq("backward", "forward")
      tol <- Seq(None, Some(1000L))
    } {
      val plain = TimeSeries.asofJoin(left, right, "k", "ts", Seq("v"),
        direction = dir, toleranceSeconds = tol)
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      // bucket width far smaller than the span → many buckets per key,
      // so cross-boundary carry is genuinely exercised
      val bucketed = TimeSeries.asofJoinBucketed(left, right, "k", "ts",
        Seq("v"), direction = dir, toleranceSeconds = tol,
        bucketSeconds = 600L)
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(bucketed == plain, s"dir=$dir tol=$tol")
      assert(plain.size == left.count())
    }
  }

  test("hot key is spread across more than one partition: the final " +
      "window clusters on (key, bucket)") {
    val (left, right) = fixture
    val out = TimeSeries.asofJoinBucketed(left, right, "k", "ts", Seq("v"),
      bucketSeconds = 600L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the carry-forward exchange must hash on both k and __bkt
    assert("hashpartitioning\\([^)]*k[^)]*__bkt".r.findFirstIn(plan).isDefined
      || "hashpartitioning\\([^)]*__bkt[^)]*k".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("hashpartitioning"))
        .mkString("\n"))
    // and the hot key genuinely spans many buckets at this width
    val nBuckets = left.filter(col("k") === 0)
      .select(floor(col("ts").cast("double") / 600).cast("long"))
      .distinct().count()
    assert(nBuckets > 10, s"fixture spans only $nBuckets buckets")
  }

  test("edge semantics survive bucketing: null left ts carries nulls, " +
      "rows before any right row carry nulls, boundary rows carry across") {
    val left = Seq(
      (1L, Some(100L), 1L),   // before any right row → null
      (1L, Some(700L), 2L),   // right row at 650 is in the PREVIOUS bucket
      (1L, None, 3L),         // null ts → null carry
      (1L, Some(1300L), 4L))  // carries across two bucket boundaries
      .toDF("k", "t", "lid")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val right = Seq((1L, 650L, 6.5))
      .toDF("k", "t", "v")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val got = TimeSeries.asofJoinBucketed(left, right, "k", "ts", Seq("v"),
      bucketSeconds = 300L)
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some(6.5), 3L -> None,
      4L -> Some(6.5)))

    // right row exactly ON a bucket edge still matches rows of its bucket
    val right2 = Seq((1L, 600L, 6.0)).toDF("k", "t", "v")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val got2 = TimeSeries.asofJoinBucketed(left, right2, "k", "ts", Seq("v"),
      bucketSeconds = 300L)
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got2(2L) == Some(6.0) && got2(4L) == Some(6.0))
  }

  test("randomized differential: bucketed equals plain across seeds and " +
      "bucket widths") {
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      // distinct ts per key on the right: unambiguous matches
      val ts = rnd.shuffle((0L until 8000L).toVector)
      val leftRows = ts.take(150).zipWithIndex.map { case (t, i) =>
        (rnd.nextInt(3).toLong, t, i.toLong)
      }
      val rightRows = ts.slice(150, 350).map(t =>
        (rnd.nextInt(3).toLong, t, rnd.nextDouble()))
      val left = leftRows.toDF("k", "t", "lid")
        .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
      val right = rightRows.toDF("k", "t", "v")
        .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
      for (bs <- Seq(100L, 1000L, 100000L)) {
        val plain = TimeSeries.asofJoin(left, right, "k", "ts", Seq("v"))
          .select("lid", "asof_v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
        val bucketed = TimeSeries.asofJoinBucketed(left, right, "k", "ts",
          Seq("v"), bucketSeconds = bs)
          .select("lid", "asof_v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1))).toMap
        assert(bucketed == plain, s"seed=$seed bucketSeconds=$bs")
      }
    }
  }
}
