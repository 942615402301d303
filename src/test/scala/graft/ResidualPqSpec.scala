package graft

import org.apache.spark.sql.functions._

import graft.extra.{AnnIndex, Similarity}

/** Residual PQ encoding (IVF-PQ over `v − coarse[list]`): the recall
  * fix for CLUSTERED corpora — the realistic embedding regime, where
  * raw-vector PQ collapses every member of a tight cluster to the same
  * byte codes (ADC sees only the dominant centroid component and
  * cannot rank within a cluster; AnnSmoke clustered mode measured the
  * collapse at 0.013 overlap on 1M vectors). The fixture plants tight
  * clusters on purpose: raw codes tie inside each cluster and the
  * shortlist degenerates to the tie-break (lowest ids), while residual
  * codes span exactly the within-cluster offsets the ranking needs.
  */
class ResidualPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val nClusters = 10
  private val k = 10

  /** n vectors in `nClusters` tight clusters: centroid (seeded uniform
    * in [-1, 1)) + per-vector wobble (±0.05) — cluster id = id mod
    * nClusters, so queries 0..4 each sit in a different cluster.
    */
  private def clustered(n: Int) = {
    val rnd = new scala.util.Random(42)
    val cents = Array.fill(nClusters, dim)(rnd.nextDouble() * 2 - 1)
    val rows = (0 until n).map { i =>
      val c = cents(i % nClusters)
      (i.toLong, Array.tabulate(dim)(d =>
        (c(d) + (rnd.nextDouble() - 0.5) * 0.1).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def overlap(approx: Set[(Long, Long)],
      exact: Set[(Long, Long)]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  private def searchRows(idx: Similarity.IvfPqIndex) =
    Similarity.searchIvfPq(idx, col("id") < 5, k = k, nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("residual codes rescue recall on a clustered corpus where raw " +
      "codes collapse") {
    val emb = clustered(4000).cache()
    val exact = pairs(Similarity.topKBruteForce(emb, "vec_id",
      "embedding", col("id") < 5, k))
    assert(exact.size == 5 * k)
    def run(residual: Boolean) = pairs(Similarity.searchIvfPq(
      Similarity.buildIvfPq(emb, "vec_id", "embedding",
        numCentroids = 16, m = 8, pqCentroids = 16,
        residual = residual).get,
      col("id") < 5, k = k, nprobe = 4))
    val rawOverlap = overlap(run(residual = false), exact)
    val residOverlap = overlap(run(residual = true), exact)
    emb.unpersist(blocking = false)
    // raw codes tie within clusters → shortlist ≈ tie-break picks;
    // residual must clear it by a wide margin, not epsilon
    assert(residOverlap >= rawOverlap + 0.2,
      s"residual $residOverlap vs raw $rawOverlap")
    assert(residOverlap >= 0.6, s"residual overlap $residOverlap < 0.6")
  }

  test("residual index round-trips through the persisted layout " +
      "bit-for-bit, flag included") {
    val emb = clustered(1000)
    val mem = Similarity.buildIvfPq(emb, "vec_id", "embedding",
      numCentroids = 8, m = 8, pqCentroids = 8, residual = true).get
    assert(mem.residual)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_residx_").toString
    AnnIndex.writeIvfPq(mem, dir)
    val disk = AnnIndex.readIvfPq(spark, dir)
    assert(disk.residual)
    val a = searchRows(mem)
    assert(a.nonEmpty && a == searchRows(disk))
  }

  test("appendIvfPq encodes appended batches with residual semantics " +
      "when the index was built residual") {
    val emb = clustered(1200)
    val first = emb.filter(col("vec_id") < 800)
    val rest = emb.filter(col("vec_id") >= 800)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_residx_app_").toString
    val initial = Similarity.buildIvfPq(first, "vec_id", "embedding",
      numCentroids = 8, m = 8, pqCentroids = 8, residual = true).get
    AnnIndex.writeIvfPq(initial, dir)
    AnnIndex.appendIvfPq(spark, dir, rest, "vec_id", "embedding")
    val appended = AnnIndex.readIvfPq(spark, dir)
    assert(appended.coded.count() == 1200)
    val full = Similarity.buildIvfPq(emb, "vec_id", "embedding",
      numCentroids = 8, m = 8, pqCentroids = 8,
      coarseCodebook = Some(initial.coarse),
      pqCodebook = Some(initial.pq), residual = true).get
    assert(searchRows(appended) == searchRows(full))
  }

  test("a pre-residual persisted index (no flag in meta) reads back " +
      "as a raw-vector index") {
    val emb = clustered(500)
    val mem = Similarity.buildIvfPq(emb, "vec_id", "embedding",
      numCentroids = 8, m = 8, pqCentroids = 8).get
    val dir = java.nio.file.Files
      .createTempDirectory("graft_residx_legacy_").toString
    AnnIndex.writeIvfPq(mem, dir)
    // simulate the legacy layout: rewrite meta/ without the flag column
    val legacyMeta = spark.read.parquet(s"$dir/meta").select("m", "sub")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    legacyMeta.toDF("m", "sub").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/meta")
    val disk = AnnIndex.readIvfPq(spark, dir)
    assert(!disk.residual)
    assert(searchRows(disk) == searchRows(mem))
  }

  test("encodeIvfPq refuses residual encoding against a coarse " +
      "codebook whose cids are not positions") {
    val emb = clustered(500)
    val raw = Similarity.buildIvfPq(emb, "vec_id", "embedding",
      numCentroids = 8, m = 8, pqCentroids = 8).get
    // raw-mode coarse cids are sample-row ids, not 0..C-1
    assume(!raw.coarse.zipWithIndex.forall { case (c, i) => c.cid == i })
    val e = intercept[IllegalArgumentException] {
      Similarity.encodeIvfPq(emb, "vec_id", "embedding", raw.coarse,
        raw.pq, raw.m, raw.sub, residual = true)
    }
    assert(e.getMessage.contains("re-keyed to positions"))
  }
}
