package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.extra.{Dedup, TimeSeries}

/** Randomized differential tests: distributed operators vs. tiny
  * driver-side reference implementations on seeded random inputs.
  */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters equals union-find on random graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 40
      val pairs = Seq.fill(60) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct

      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = touched.map(id => id -> {
        // cluster = min node id in the component
        val root = find(id.toInt)
        touched.filter(o => find(o.toInt) == root).min
      }).toMap

      val got = Dedup.dupClusters(pairs.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("asofJoin (both directions, with/without tolerance) equals brute force") {
    val rnd = new Random(99)
    val leftRows = Seq.tabulate(120)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toLong))
    val rightRows = Seq.tabulate(150)(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, rnd.nextDouble()))
    val left = leftRows.toDF("k", "t", "lid")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val right = rightRows.toDF("k", "t", "v")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")

    def reference(dir: String, tol: Option[Long]): Map[Long, Option[Double]] =
      leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter(_._1 == k)
          .filter(r => if (dir == "backward") r._2 <= t else r._2 >= t)
        val best =
          if (cands.isEmpty) None
          else Some(
            if (dir == "backward") cands.maxBy(r => (r._2, r._3)) // ties: any — see below
            else cands.minBy(r => (r._2, -r._3)))
        val within = best.filter(b =>
          tol.forall(s => math.abs(b._2 - t) <= s))
        lid -> within.map(_._3)
      }.toMap

    for {
      dir <- Seq("backward", "forward")
      tol <- Seq(None, Some(500L))
    } {
      val got = TimeSeries.asofJoin(left, right, "k", "ts", Seq("v"),
        direction = dir, toleranceSeconds = tol)
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      // equal right timestamps make the carried value implementation-
      // defined; compare on rows whose matched ts is unique per (k, ts)
      val dupTs = rightRows.groupBy(r => (r._1, r._2))
        .filter(_._2.size > 1).keySet
      val ref = reference(dir, tol)
      for ((lid, refV) <- ref) {
        val (k, t, _) = leftRows.find(_._3 == lid).get
        val matchedTs = rightRows.filter(_._1 == k)
          .filter(r => if (dir == "backward") r._2 <= t else r._2 >= t)
        val bestTs =
          if (matchedTs.isEmpty) None
          else Some(if (dir == "backward") matchedTs.map(_._2).max
            else matchedTs.map(_._2).min)
        val ambiguous = bestTs.exists(bt => dupTs.contains((k, bt)))
        if (!ambiguous)
          assert(got(lid) == refV, s"dir=$dir tol=$tol lid=$lid")
        else // still must match SOME candidate at the best timestamp
          assert(refV.isEmpty == got(lid).isEmpty, s"dir=$dir tol=$tol lid=$lid")
      }
    }
  }
}
