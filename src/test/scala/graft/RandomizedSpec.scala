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

  test("maxDrawdown equals the driver-side scan on random daily series") {
    import graft.extra.Analytics
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      val rows = (1 to 60).map { d =>
        ("k", java.sql.Timestamp.valueOf(
          f"2024-${d / 31 + 1}%02d-${d % 31 + 1}%02d 12:00:00"),
          10.0 + rnd.nextInt(100) / 10.0)
      }
      // driver reference over the daily means (one obs per day here)
      val daily = rows.map(r => (r._2.toLocalDateTime.toLocalDate, r._3))
        .sortBy(_._1.toString).map(_._2)
      var peak = Double.MinValue
      var maxRel = 0.0
      var maxAbs = 0.0
      daily.foreach { v =>
        peak = math.max(peak, v)
        maxAbs = math.max(maxAbs, peak - v)
        if (peak > 0) maxRel = math.max(maxRel, (peak - v) / peak)
      }
      val got = Analytics.maxDrawdown(rows.toDF("g", "ts", "v"),
        "g", "ts", "v").collect().head
      assert(math.abs(got.getAs[Double]("max_drawdown") - maxRel) < 1e-6,
        s"seed=$seed")
      assert(math.abs(got.getAs[Double]("max_abs_drawdown") - maxAbs) < 1e-6,
        s"seed=$seed")
    }
  }

  test("pairCorrelation matches driver-side Pearson on random " +
      "aligned series") {
    import graft.extra.Analytics
    val rnd = new Random(17)
    val xs = (1 to 50).map(_ => rnd.nextDouble() * 10)
    val ys = (1 to 50).map(_ => rnd.nextDouble() * 10)
    val rows = (0 until 50).flatMap { h =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")
      Seq(("a", ts, xs(h)), ("b", ts, ys(h)))
    }
    // driver Pearson on the 6-dp-rounded series (what the operator sees)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (x6, y6) = (xs.map(r6), ys.map(r6))
    val n = 50.0
    val (sx, sy) = (x6.sum, y6.sum)
    val sxy = x6.zip(y6).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (x6.map(a => a * a).sum, y6.map(a => a * a).sum)
    val ref = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = Analytics.pairCorrelation(rows.toDF("g", "ts", "v"),
      "g", "ts", "v").collect().head.getAs[Double]("corr")
    assert(math.abs(got - ref) < 1e-5, s"got $got ref $ref")
  }

  test("gapFill row count equals the per-key grid span and non-gap " +
      "rows equal observed buckets") {
    import graft.extra.Analytics
    val rnd = new Random(23)
    val rows = (1 to 200).map { i =>
      val h = rnd.nextInt(72)
      ("k" + (i % 3),
        java.sql.Timestamp.valueOf(
          f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextDouble(), i.toLong)
    }
    val df = rows.toDF("g", "ts", "v", "id")
    val out = Analytics.gapFill(df, "g", "ts", "v", "id").collect()
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, rs) =>
      val hours = rs.map(r => r._2.getTime / 3600000L)
      val span = hours.max - hours.min + 1
      val mine = out.filter(_.getString(0) == k)
      assert(mine.length == span, s"$k: ${mine.length} vs span $span")
      assert(mine.count(!_.getAs[Boolean]("is_gap")) ==
        hours.distinct.length, s"$k observed-bucket count")
      // every filled value is non-null from the first bucket on
      assert(mine.forall(!_.isNullAt(2)), s"$k has null filled values")
    }
  }

  test("persisted BM25 differential: random corpora + random append " +
      "splits ≡ direct search and ≡ union build (seeded)") {
    val vocab = Vector("spark", "shuffle", "join", "sort", "hash",
      "merge", "scan", "index", "query", "plan", "the", "of")
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      val docs = (0L until 60L).map { i =>
        (i, Seq.fill(4 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val d = java.nio.file.Files
        .createTempDirectory(s"rand_bm25_$seed").toString
      // random split into 3 append batches over a fresh dir
      val cut1 = 10 + rnd.nextInt(20); val cut2 = cut1 + 10 + rnd.nextInt(20)
      graft.extra.Bm25Index.build(
        df.filter(col("doc_id") < cut1), "doc_id", "text", d)
      graft.extra.Bm25Index.append(
        df.filter(col("doc_id") >= cut1 && col("doc_id") < cut2),
        "doc_id", "text", d)
      graft.extra.Bm25Index.append(
        df.filter(col("doc_id") >= cut2), "doc_id", "text", d)
      val terms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).distinct
      def rows(x: org.apache.spark.sql.DataFrame) = x.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val direct = rows(graft.extra.Retrieval.bm25Search(
        df, "doc_id", "text", terms, topK = 60))
      assert(rows(graft.extra.Bm25Index.search(spark, d, terms,
        idCol = "doc_id", topK = 60)) == direct, s"seed=$seed")
      // compaction preserves the differential too
      graft.extra.Bm25Index.compact(spark, d)
      assert(rows(graft.extra.Bm25Index.search(spark, d, terms,
        idCol = "doc_id", topK = 60)) == direct, s"seed=$seed compacted")
    }
  }

  test("Merge differential: random upsert/delete sequences against a " +
      "driver-side model (seeded)") {
    for (seed <- Seq(5, 13)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"rand_merge_$seed").toString
      // base: a random 70% subset of ids 0..199 (gaps exercise the
      // absent-key paths)
      var model: Map[Long, (Double, String)] =
        (0L until 200L).filter(_ => rnd.nextDouble() < 0.7)
          .map(i => i -> (rnd.nextDouble(), s"d$i")).toMap
      graft.extra.Layout.writeClustered(
        model.toSeq.map { case (k, (v, t)) => (k, v, t) }
          .toDF("id", "v", "text"),
        dir, Seq(col("id")), 6)
      for (step <- 1 to 4) {
        if (rnd.nextBoolean()) {
          // upsert: mixed existing + brand-new keys
          val keys = Seq.fill(15)(rnd.nextLong(250).abs).distinct
          val batch = keys.map(k => (k, rnd.nextDouble(), s"u$step-$k"))
          graft.extra.Merge.upsert(spark, dir,
            batch.toDF("id", "v", "text"), "id")
          model = model ++ batch.map { case (k, v, t) => k -> (v, t) }
        } else {
          // delete: mixed present + absent keys
          val keys = Seq.fill(10)(rnd.nextLong(250).abs).distinct
          graft.extra.Merge.delete(spark, dir, keys.toDF("id"), "id")
          model = model -- keys
        }
        val got = spark.read.parquet(dir).collect()
          .map(r => (r.getLong(0), (r.getDouble(1), r.getString(2))))
          .toMap
        assert(got == model, s"seed=$seed step=$step: " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"missing=${(model.keySet -- got.keySet).take(5)}")
      }
    }
  }

  test("index-delete differential: random deletes + compact ≡ direct " +
      "search over the surviving corpus (seeded)") {
    val vocab = Vector("spark", "shuffle", "join", "sort", "hash",
      "merge", "scan", "index", "query", "plan", "the", "of")
    for (seed <- Seq(7, 19)) {
      val rnd = new Random(seed)
      val docs = (0L until 60L).map { i =>
        (i, Seq.fill(4 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val d = java.nio.file.Files
        .createTempDirectory(s"rand_bmdel_$seed").toString
      graft.extra.Bm25Index.build(df, "doc_id", "text", d)
      val dead = Seq.fill(12)(rnd.nextLong(70).abs).distinct // some absent
      graft.extra.Bm25Index.delete(spark, d, dead.toDF("doc_id"),
        "doc_id")
      val live = df.filter(!col("doc_id").isin(dead: _*))
      val terms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).distinct
      def rows(x: org.apache.spark.sql.DataFrame) = x.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // pre-compact: membership exact (df staleness may reorder scores)
      val pre = rows(graft.extra.Bm25Index.search(spark, d, terms,
        idCol = "doc_id", topK = 60))
      assert(!pre.map(_._1).toSet.exists(dead.contains), s"seed=$seed")
      // post-compact: full bit-parity with the direct form on survivors
      graft.extra.Bm25Index.compact(spark, d)
      val direct = rows(graft.extra.Retrieval.bm25Search(
        live, "doc_id", "text", terms, topK = 60))
      assert(rows(graft.extra.Bm25Index.search(spark, d, terms,
        idCol = "doc_id", topK = 60)) == direct, s"seed=$seed compacted")
    }
  }
}
