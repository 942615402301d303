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
