package graft

import org.apache.spark.sql.functions._

import graft.extra.Similarity

/** Spherical k-means codebook build (the production IVF path): cluster
  * recovery on separable data, empty-cluster stability, and end-to-end
  * IVF search through a trained codebook.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // three exactly-separable direction blobs in dim 4: cluster axis ± a
  // small off-axis wobble, cosine within blob ≈ 1, across blobs ≈ 0
  private def blobs = {
    val rows = for {
      (axis, base) <- Seq(0, 1, 2).zip(Seq(0L, 100L, 200L))
      i <- 0 until 20
    } yield {
      val v = Array.fill(4)(0.02f * (i % 5))
      v(axis) = 1.0f
      (base + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans recovers separable direction blobs") {
    val cents = Similarity.kmeansCodebook(blobs, "vec_id", "embedding",
      k = 3, iters = 4)
    assert(cents.size == 3)
    // each blob's dominant axis should be the dominant axis of exactly
    // one centroid
    val domAxes = cents.map(_.v.zipWithIndex.maxBy(_._1)._2).toSet
    assert(domAxes == Set(0, 1, 2), cents.map(_.v.toSeq).toString)
  }

  test("iters=0 returns the deterministic seed sample re-keyed 0..k-1") {
    val seed = Similarity.kmeansCodebook(blobs, "vec_id", "embedding",
      k = 5, iters = 0)
    assert(seed.map(_.cid) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(seed.forall(_.v.length == 4))
  }

  test("kmeans at dim=1024: constant-size plan, blobs recovered in " +
      "bounded time") {
    // three separable direction blobs in dim 1024 — the regime where the
    // old per-dimension element_at aggregation blew up plan/codegen
    val dim = 1024
    val rows = for {
      (axis, base) <- Seq(0, 400, 800).zip(Seq(0L, 100L, 200L))
      i <- 0 until 10
    } yield {
      val v = Array.fill(dim)(0.01f * (i % 3))
      v(axis) = 1.0f
      (base + i, v)
    }
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansCodebook(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3, iters = 3)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cents.size == 3)
    assert(cents.forall(_.v.length == dim))
    val domAxes = cents.map(_.v.zipWithIndex.maxBy(_._1)._2).toSet
    assert(domAxes == Set(0, 400, 800))
    assert(secs < 120, s"dim=1024 build took ${secs}s")
  }

  // Skewed planted-cluster corpus for the PQ build: a dominant tight
  // blob (80 of 96 points) plus two far clusters — with ids assigned
  // BY md5 hash order so the sampleCodebook's first-4 draw is all-blob
  // by construction (not by luck: an earlier fixture left the sample
  // with a far-cluster point and recall tied). Blob-only sample
  // centroids are near-identical, so ADC codes carry no cluster signal
  // for the far queries; per-subspace Lloyd pulls centroids onto the
  // real structure. Deterministic sin-based wobble.
  private lazy val (skewed, farIds) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString // same md5-hex ordering Spark uses
    val ids = (0L until 96L).sortBy(h)
    def pt(center: Array[Float], i: Int) =
      center.zipWithIndex.map { case (c, d) =>
        c + 0.1f * math.sin(i * 7 + d).toFloat }
    val blob = ids.take(80).zipWithIndex.map { case (id, i) =>
      (id, pt(Array(10f, 10f, 0f, 0f, 10f, 10f, 0f, 0f), i)) }
    // far clusters are ELONGATED (position t = -8.05..8.05 along a
    // cluster-specific direction): within-cluster cosine ranking then
    // depends on position, so recall rewards a codebook fine enough to
    // subdivide the cluster — which Lloyd learns and a blob-only
    // sample cannot
    val c1 = ids.slice(80, 88).zipWithIndex.map { case (id, i) =>
      val t = (i - 3.5f) * 2.3f
      val base = pt(Array(0f, 0f, 20f, 20f, 0f, 0f, 20f, 20f), i)
      (id, base.zipWithIndex.map { case (x, d) =>
        if (d == 2 || d == 6) x + t else x })
    }
    val c2 = ids.slice(88, 96).zipWithIndex.map { case (id, i) =>
      val t = (i - 3.5f) * 2.3f
      val base = pt(Array(-20f, 0f, 0f, -20f, -20f, 0f, 0f, -20f), i)
      (id, base.zipWithIndex.map { case (x, d) =>
        if (d == 0 || d == 4) x + t else x })
    }
    ((blob ++ c1 ++ c2).toDF("vec_id", "embedding"),
      ids.drop(80))
  }

  private def pqRecall(corpus: org.apache.spark.sql.DataFrame,
      codebook: Option[Seq[Similarity.Centroid]]): Double = {
    val pred = col("vec_id").isin(farIds: _*)
    val truth = Similarity.topKBruteForce(corpus, "vec_id", "embedding",
        pred, 5).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    // candFactor=1: the shortlist IS the ADC top-k, so recall directly
    // measures codebook quality (no re-rank slack)
    val got = Similarity.topKPq(corpus, "vec_id", "embedding", pred, 5,
        m = 2, numCentroids = 16, candFactor = 1, codebook = codebook)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = truth.map { case (q, t) =>
      (t intersect got.getOrElse(q, Set.empty[Long])).size }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  /** Total PQ quantization error of `corpus` under a stitched codebook:
    * per row, per subspace, squared distance to the NEAREST subspace
    * centroid (lowest-j tie-break, like PqEncode), summed. Driver-side
    * on the collected fixture — 96 rows of dim 8.
    */
  private def pqQuantError(corpus: org.apache.spark.sql.DataFrame,
      cents: Seq[Similarity.Centroid], m: Int): Double = {
    val vs = corpus.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = vs.head.length
    val sub = dim / m
    vs.map { v =>
      (0 until m).map { s =>
        cents.map { c =>
          (0 until sub).map { d =>
            val x = v(s * sub + d) - c.v(s * sub + d)
            x * x
          }.sum
        }.min
      }.sum
    }.sum
  }

  test("kmeansPqCodebook iters=0 returns the deterministic " +
      "farthest-first seeds, re-keyed 0..k-1, stitched full-dim") {
    val t0 = Similarity.kmeansPqCodebook(skewed, "vec_id", "embedding",
      m = 2, numCentroids = 4, iters = 0)
    assert(t0.map(_.cid) == Seq(0L, 1L, 2L, 3L))
    assert(t0.forall(_.v.length == 8))
    // deterministic: an identical second build is bit-identical
    val again = Similarity.kmeansPqCodebook(skewed, "vec_id", "embedding",
      m = 2, numCentroids = 4, iters = 0)
    assert(t0.map(_.v.toSeq) == again.map(_.v.toSeq))
  }

  test("trained PQ codebook cuts quantization error and improves " +
      "recall vs the sample codebook on the skewed corpus") {
    val corpus = skewed
    val sample = Similarity.sampleCodebook(corpus, "vec_id", "embedding", 16)
    val trained = Similarity.kmeansPqCodebook(corpus, "vec_id",
      "embedding", m = 2, numCentroids = 16, iters = 10)
    // Lloyd monotonically decreases the objective; from a blob-heavy
    // init with far planted clusters the first step strictly improves
    val errS = pqQuantError(corpus, sample, 2)
    val errT = pqQuantError(corpus, trained, 2)
    assert(errT < errS,
      s"trained quant error $errT must beat sample $errS")
    val rS = pqRecall(corpus, None)
    val rT = pqRecall(corpus, Some(trained))
    assert(rT > rS, s"trained recall $rT must beat sample $rS")
  }

  test("topKIvfPq accepts a trained PQ codebook end-to-end") {
    val corpus = skewed
    val trained = Similarity.kmeansPqCodebook(corpus, "vec_id",
      "embedding", m = 2, numCentroids = 4, iters = 5)
    val idx = Similarity.buildIvfPq(corpus, "vec_id", "embedding",
      numCentroids = 8, m = 2, pqCentroids = 4,
      pqCodebook = Some(trained)).get
    val out = Similarity.searchIvfPq(idx,
      col("vec_id").isin(farIds.drop(8): _*), k = 3, nprobe = 4).collect()
    assert(out.nonEmpty)
    val ranked = out.groupBy(_.getLong(0))
    for ((_, rows) <- ranked)
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq ==
        (1 to rows.length))
  }

  test("sim_topk_pq_trained (registered query): well-formed ranked " +
      "output with recall vs exact at least the sample twin's (sf0.001)") {
    // the registered rows-only query (estimates are engine-specific,
    // like the HLL pair) — this is its quality gate: same data, same
    // queries, trained codebook must not LOSE recall vs sim_topk_pq
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(graft.queries.SimilarityQueriesImpl
      .simTopK(spark, sfDir).collect())
    val trainedRows = graft.queries.SimilarityQueriesImpl
      .simTopKPqTrained(spark, sfDir).collect()
    val sample = pairs(graft.queries.SimilarityQueriesImpl
      .simTopKPq(spark, sfDir).collect())
    // well-formed: 10 queries × 5 ranked rows
    assert(trainedRows.length == 50)
    val byQuery = trainedRows.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    for ((_, rows) <- byQuery)
      assert(rows.sortBy(_.getInt(1)).map(_.getInt(1)).toSeq == (1 to 5))
    val rT = pairs(trainedRows).intersect(exact).size.toDouble / exact.size
    val rS = sample.intersect(exact).size.toDouble / exact.size
    assert(rT >= rS, s"trained recall $rT regressed below sample $rS")
  }

  test("topKIvfKmeans: valid ranked output with nonzero recall (sf0.001)") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.topKIvfKmeans(emb, "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5, numCentroids = 16, iters = 3)
      .collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet.subsetOf((0L until 10L).toSet))
    for ((_, rows) <- byQuery) {
      val ranked = rows.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      // cosine non-increasing in rank
      val cos = ranked.map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }
}
