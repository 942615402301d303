package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Similarity
import graft.model.Tables

/** Similarity-search queries over the embeddings table (north-star X4):
  * exact brute-force top-k and the LSH-bucketed approximate variant.
  */
object SimilarityQueriesImpl {

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private val normSql =
    """list_sum(list_transform(range(0, len(embedding)),
      |    i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))""".stripMargin

  private def dotSql(a: String, b: String) =
    s"""list_sum(list_transform(range(0, len($a.embedding)),
       |    i -> CAST($a.embedding[i+1] AS DOUBLE) * CAST($b.embedding[i+1] AS DOUBLE)))""".stripMargin

  // ---- sim_topk (exact brute force) --------------------------------

  /** Exact top-5 cosine neighbors for the first 10 vectors. */
  def simTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.topKBruteForce(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val simTopKOracle =
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${dotSql("c", "q")} / (sqrt(c.nrm) * sqrt(q.nrm)), 6) AS cosine
       |  FROM e c JOIN e q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---- sim_topk_int8 (quantized scan + exact re-rank) --------------

  /** Int8-quantized top-5: integer-dot scan over int8 codes (the
    * 4×-smaller corpus a 100 TB deployment would store), top-15
    * candidates per query, exact float-cosine re-rank. Candidate
    * selection is integer-exact with id tie-breaks, so the oracle
    * reproduces it bit-for-bit.
    */
  def simTopKInt8(s: SparkSession, dir: String): DataFrame =
    Similarity.topKInt8(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val simTopKInt8Oracle =
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding, $normSql AS nrm,
       |    greatest(list_max(list_transform(embedding,
       |      x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS scale
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, embedding, nrm,
       |    list_transform(embedding,
       |      x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS qv
       |  FROM e0),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    c.embedding AS ce, q.embedding AS qe, c.nrm AS cn, q.nrm AS qn,
       |    CAST(list_sum(list_transform(range(0, len(c.qv)),
       |      i -> c.qv[i+1] * q.qv[i+1])) AS BIGINT) AS qdot
       |  FROM e c JOIN e q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |r1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY qdot DESC, neighbor_id) AS qrank
       |  FROM sc),
       |re AS (
       |  SELECT query_id, neighbor_id, qdot,
       |    round(list_sum(list_transform(range(0, len(ce)),
       |        i -> CAST(ce[i+1] AS DOUBLE) * CAST(qe[i+1] AS DOUBLE)))
       |      / (sqrt(cn) * sqrt(qn)), 6) AS cosine
       |  FROM r1 WHERE qrank <= 15),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine, qdot,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM re)
       |SELECT query_id, rank, neighbor_id, cosine, qdot
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---- sim_topk_lsh (bucketed approximate) -------------------------

  /** LSH-bucketed top-5: only same-bucket candidates are scored. */
  def simTopKLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.topKLsh(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val simTopKLshOracle = {
    val planeDots = (0 until Similarity.NumPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(range(0, len(embedding)),
         |      i -> CAST(embedding[i+1] AS DOUBLE)
         |           * CAST((i*31 + $p*17) % 7 - 3 AS DOUBLE))) >= 0
         |    THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString("\n    + ")
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm,
       |    $planeDots AS bucket
       |  FROM embeddings),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(${dotSql("c", "q")} / (sqrt(c.nrm) * sqrt(q.nrm)), 6) AS cosine
       |  FROM e c JOIN e q
       |    ON q.vec_id < 10 AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- sim_topk_lsh_multi (multi-table, production recall) ---------

  def simTopKLshMulti(s: SparkSession, dir: String): DataFrame =
    Similarity.topKLshMulti(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5, tables = 4, bits = 4)
      .orderBy("query_id", "rank")

  private val simTopKLshMultiOracle = {
    def bucketSql(tbl: Int, bits: Int): String =
      (0 until bits).map { p =>
        val q = tbl * bits + p
        s"""CASE WHEN list_sum(list_transform(range(0, len(embedding)),
           |      i -> CAST(embedding[i+1] AS DOUBLE)
           |           * CAST((i*31 + $q*17) % 7 - 3 AS DOUBLE))) >= 0
           |    THEN ${1L << p} ELSE 0 END""".stripMargin
      }.mkString(" + ")
    val buckets = (0 until 4)
      .map(l => s"    ${bucketSql(l, 4)} AS b$l").mkString(",\n")
    val anyMatch = (0 until 4).map(l => s"c.b$l = q.b$l").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm,
       |$buckets
       |  FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM e c JOIN e q
       |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id AND ($anyMatch)),
       |sc AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(${dotSql("c", "q")} / (sqrt(c.nrm) * sqrt(q.nrm)), 6) AS cosine
       |  FROM cand
       |  JOIN e c ON c.vec_id = cand.neighbor_id
       |  JOIN e q ON q.vec_id = cand.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- sim_topk_ivf (inverted-file coarse quantizer) ---------------

  def simTopKIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.topKIvf(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5, numCentroids = 32, nprobe = 3)
      .orderBy("query_id", "rank")

  private val simTopKIvfOracle =
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dotSql("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM e v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE crk = 1),
       |probes AS (SELECT vec_id AS query_id, cid AS list_id
       |           FROM asgr WHERE vec_id < 10 AND crk <= 3),
       |sc AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(${dotSql("ce", "qe")} / (sqrt(ce.nrm) * sqrt(qe.nrm)), 6)
       |      AS cosine
       |  FROM probes p
       |  JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
       |  JOIN e ce ON ce.vec_id = a.vec_id
       |  JOIN e qe ON qe.vec_id = p.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---- sim_topk_pq (product quantization + ADC) --------------------

  /** PQ top-5: 8 subspaces × 16 deterministic sample centroids — each
    * corpus vector stored as 8 one-byte codes (32× smaller than the
    * float vector), queries score via an m×k distance-table lookup sum
    * (ADC), exact float re-rank on the top-15. The codebook, codes, ADC
    * distances, and candidate ranks are all engine-deterministic
    * (rounded distances, id tie-breaks), so the oracle rebuilds the
    * entire index and reproduces the result bit-for-bit.
    */
  def simTopKPq(s: SparkSession, dir: String): DataFrame =
    Similarity.topKPq(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val simTopKPqOracle = {
    val subD2 = (v: String, c: String) =>
      s"""round(list_sum(list_transform(range(sub.s*8, sub.s*8 + 8),
         |      i -> (CAST($v.embedding[i+1] AS DOUBLE)
         |            - CAST($c.embedding[i+1] AS DOUBLE))
         |         * (CAST($v.embedding[i+1] AS DOUBLE)
         |            - CAST($c.embedding[i+1] AS DOUBLE)))), 6)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |c AS (SELECT embedding,
       |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |          vec_id) - 1 AS j
       |      FROM embeddings
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |sub AS (SELECT unnest(range(0, 8)) AS s),
       |asgd AS (
       |  SELECT v.vec_id, sub.s AS s, c.j, ${subD2("v", "c")} AS d2
       |  FROM embeddings v CROSS JOIN sub CROSS JOIN c),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
       |    FROM asgd) WHERE rk = 1),
       |qd AS (SELECT vec_id AS query_id, s, j, d2 FROM asgd
       |       WHERE vec_id < 10),
       |adc AS (
       |  SELECT q.query_id, x.vec_id AS neighbor_id,
       |    round(sum(q.d2), 6) AS adc_d2
       |  FROM codes x JOIN qd q ON q.s = x.s AND q.j = x.code
       |  WHERE x.vec_id <> q.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_d2, neighbor_id) AS crk
       |  FROM adc),
       |sc AS (
       |  SELECT cd.query_id, cd.neighbor_id, cd.adc_d2,
       |    round(${dotSql("ce", "qe")} / (sqrt(ce.nrm) * sqrt(qe.nrm)), 6)
       |      AS cosine
       |  FROM cand cd
       |  JOIN e ce ON ce.vec_id = cd.neighbor_id
       |  JOIN e qe ON qe.vec_id = cd.query_id
       |  WHERE cd.crk <= 15),
       |r AS (
       |  SELECT query_id, neighbor_id, adc_d2, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine, adc_d2
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- sim_topk_ivfpq (coarse lists + PQ codes) --------------------

  /** IVF-PQ top-5: the full 100 TB ANN shape — 32-centroid coarse
    * quantizer restricts each query to 3 posting lists; within them,
    * scoring runs over 8×16 PQ byte codes via ADC lookups; exact float
    * re-rank on the top-15. Both codebooks are the deterministic
    * hash-ordered sample, so the oracle rebuilds the composed index.
    */
  def simTopKIvfPq(s: SparkSession, dir: String): DataFrame =
    Similarity.topKIvfPq(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val simTopKIvfPqOracle = {
    val subD2 = (v: String, c: String) =>
      s"""round(list_sum(list_transform(range(sub.s*8, sub.s*8 + 8),
         |      i -> (CAST($v.embedding[i+1] AS DOUBLE)
         |            - CAST($c.embedding[i+1] AS DOUBLE))
         |         * (CAST($v.embedding[i+1] AS DOUBLE)
         |            - CAST($c.embedding[i+1] AS DOUBLE)))), 6)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dotSql("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM e v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE crk = 1),
       |probes AS (SELECT vec_id AS query_id, cid AS list_id
       |           FROM asgr WHERE vec_id < 10 AND crk <= 3),
       |pc AS (SELECT embedding,
       |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |          vec_id) - 1 AS j
       |      FROM embeddings
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |sub AS (SELECT unnest(range(0, 8)) AS s),
       |asgd AS (
       |  SELECT v.vec_id, sub.s AS s, pc.j, ${subD2("v", "pc")} AS d2
       |  FROM embeddings v CROSS JOIN sub CROSS JOIN pc),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
       |    FROM asgd) WHERE rk = 1),
       |qd AS (SELECT vec_id AS query_id, s, j, d2 FROM asgd
       |       WHERE vec_id < 10),
       |cands AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg a
       |    ON a.list_id = p.list_id AND a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT cd.query_id, cd.neighbor_id, round(sum(q.d2), 6) AS adc_d2
       |  FROM cands cd
       |  JOIN codes x ON x.vec_id = cd.neighbor_id
       |  JOIN qd q ON q.query_id = cd.query_id AND q.s = x.s
       |           AND q.j = x.code
       |  GROUP BY 1, 2),
       |cnd AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_d2, neighbor_id) AS crk2
       |  FROM adc),
       |sc AS (
       |  SELECT cd.query_id, cd.neighbor_id, cd.adc_d2,
       |    round(${dotSql("ce", "qe")} / (sqrt(ce.nrm) * sqrt(qe.nrm)), 6)
       |      AS cosine
       |  FROM cnd cd
       |  JOIN e ce ON ce.vec_id = cd.neighbor_id
       |  JOIN e qe ON qe.vec_id = cd.query_id
       |  WHERE cd.crk2 <= 15),
       |r AS (
       |  SELECT query_id, neighbor_id, adc_d2, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine, adc_d2
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- sim_topk_ivfpq_residual (residual-encoded IVF-PQ) -----------

  /** RESIDUAL IVF-PQ top-5 — the production default for clustered
    * corpora (Jégou et al. §IV.B; FAISS IndexIVFPQ encodes residuals
    * by default): PQ codes quantize `v − coarse[list(v)]` instead of
    * the raw vector, so ADC ranks the WITHIN-list geometry raw-vector
    * PQ collapses (AnnSmoke measured raw-PQ overlap 0.013 on a
    * clustered 1M corpus; the residual arm restores it — see the
    * clustered smoke arm). Both codebooks stay the deterministic
    * hash-order sample — coarse re-keyed to positions 0..31, the PQ
    * codebook sampled in RESIDUAL space (samples 33..48 of the same
    * hash order, each minus its nearest coarse centroid; the first 32
    * are the coarse centroids themselves with zero residuals,
    * filtered) — so the oracle rebuilds the composed index exactly.
    */
  def simTopKIvfPqResidual(s: SparkSession, dir: String): DataFrame =
    Similarity.topKIvfPq(embeddings(s, dir), "vec_id", "embedding",
      queryPred = col("id") < 10, k = 5, residual = true)
      .orderBy("query_id", "rank")

  private val simTopKIvfPqResidualOracle = {
    // residual sub-distance in the ENGINE's association:
    // ((v − coarse) − pq)² accumulated over the subspace, rounded 6 dp
    // — PqEncodeResidual/driverDTable compute exactly this order
    val resD2 = (v: String, cc: String, r: String) =>
      s"""round(list_sum(list_transform(range(sub.s*8, sub.s*8 + 8),
         |      i -> ((CAST($v.embedding[i+1] AS DOUBLE)
         |             - CAST($cc.embedding[i+1] AS DOUBLE)) - $r.r[i+1])
         |         * ((CAST($v.embedding[i+1] AS DOUBLE)
         |             - CAST($cc.embedding[i+1] AS DOUBLE)) - $r.r[i+1]))),
         |  6)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |c AS (SELECT embedding, nrm AS cn,
       |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |          vec_id) - 1 AS cid
       |      FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dotSql("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM e v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE crk = 1),
       |probes AS (SELECT vec_id AS query_id, cid AS list_id
       |           FROM asgr WHERE vec_id < 10 AND crk <= 3),
       |samp AS (SELECT embedding, nrm,
       |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |          vec_id) - 1 AS sidx
       |      FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 48),
       |snear AS (
       |  SELECT s.sidx, c.cid,
       |    row_number() OVER (PARTITION BY s.sidx ORDER BY
       |      round(${dotSql("s", "c")} / (sqrt(s.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM samp s CROSS JOIN c),
       |sres AS (
       |  SELECT s.sidx,
       |    list_transform(range(0, len(s.embedding)), i ->
       |      CAST(s.embedding[i+1] AS DOUBLE)
       |        - CAST(c.embedding[i+1] AS DOUBLE)) AS r
       |  FROM samp s
       |  JOIN snear n ON n.sidx = s.sidx AND n.crk = 1
       |  JOIN c ON c.cid = n.cid),
       |pq AS (SELECT r, sidx FROM (
       |    SELECT r, sidx,
       |      list_sum(list_transform(r, x -> x * x)) AS rnrm
       |    FROM sres) WHERE rnrm > 0
       |  ORDER BY sidx LIMIT 16),
       |pqj AS (SELECT r, row_number() OVER (ORDER BY sidx) - 1 AS j
       |        FROM pq),
       |sub AS (SELECT unnest(range(0, 8)) AS s),
       |asgd AS (
       |  SELECT v.vec_id, sub.s AS s, pqj.j, ${resD2("v", "cc", "pqj")} AS d2
       |  FROM e v
       |  JOIN asg a ON a.vec_id = v.vec_id
       |  JOIN c cc ON cc.cid = a.list_id
       |  CROSS JOIN sub CROSS JOIN pqj),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
       |    FROM asgd) WHERE rk = 1),
       |qd AS (
       |  SELECT p.query_id, p.list_id, sub.s AS s, pqj.j,
       |    ${resD2("q", "cc", "pqj")} AS d2
       |  FROM probes p
       |  JOIN e q ON q.vec_id = p.query_id
       |  JOIN c cc ON cc.cid = p.list_id
       |  CROSS JOIN sub CROSS JOIN pqj),
       |cands AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, p.list_id
       |  FROM probes p JOIN asg a
       |    ON a.list_id = p.list_id AND a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT cd.query_id, cd.neighbor_id, round(sum(q.d2), 6) AS adc_d2
       |  FROM cands cd
       |  JOIN codes x ON x.vec_id = cd.neighbor_id
       |  JOIN qd q ON q.query_id = cd.query_id AND q.list_id = cd.list_id
       |           AND q.s = x.s AND q.j = x.code
       |  GROUP BY 1, 2),
       |cnd AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_d2, neighbor_id) AS crk2
       |  FROM adc),
       |sc AS (
       |  SELECT cd.query_id, cd.neighbor_id, cd.adc_d2,
       |    round(${dotSql("ce", "qe")} / (sqrt(ce.nrm) * sqrt(qe.nrm)), 6)
       |      AS cosine
       |  FROM cnd cd
       |  JOIN e ce ON ce.vec_id = cd.neighbor_id
       |  JOIN e qe ON qe.vec_id = cd.query_id
       |  WHERE cd.crk2 <= 15),
       |r AS (
       |  SELECT query_id, neighbor_id, adc_d2, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine, adc_d2
       |FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- sim_topk_pq_trained (Lloyd-trained codebook) ----------------

  /** PQ top-5 with a TRAINED codebook: per-subspace Lloyd's k-means
    * ([[Similarity.kmeansPqCodebook]] — 3 iterations from a
    * farthest-first seed) instead of the deterministic hash sample.
    * The training loop is engine-specific float iteration (centroid
    * means depend on the k-means trajectory), so like the HLL pair the
    * query is registered rows-only; KmeansSpec pins the quality
    * contract — quantization error strictly below the sample
    * codebook's, recall vs exact at least the sample twin's
    * ([[simTopKPq]]) on the same data. The codebook is TRAIN-ONCE,
    * content-keyed ([[IndexedCorpus.trainedPqCodebook]]): the first
    * call pays the Lloyd iterations, later calls read the persisted
    * quantizer — production versions the quantizer with its data.
    */
  def simTopKPqTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val cb = IndexedCorpus.trainedPqCodebook(emb, "vec_id", "embedding",
      m = 8, numCentroids = 16, iters = 3)
    Similarity.topKPq(emb, "vec_id", "embedding",
        queryPred = col("id") < 10, k = 5,
        codebook = if (cb.isEmpty) None else Some(cb))
      .orderBy("query_id", "rank")
  }

  // ---- decontaminate_semantic --------------------------------------

  /** Embedding-space decontamination ([[graft.extra.Text
    * .decontaminateSemantic]]): the benchmark is the deterministic
    * `vec_id % 19 = 0` slice of the embeddings table (the eval-suite
    * stand-in — tiny by construction, collected and shipped as
    * constant loop-codegen state), the corpus is everything else, and
    * a corpus vector is contaminated when its max 6-dp-rounded cosine
    * against any benchmark vector reaches 0.3 (discriminative for the
    * synthetic embedding distribution — ~15% flag; a production
    * deployment sets it near 1 for paraphrase leakage). The whole
    * corpus side is ONE projection — no join, no shuffle — so the
    * oracle replays the exact arithmetic: per-pair dot in doubles,
    * round 6 dp, max, threshold.
    */
  def decontaminateSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    graft.extra.Text.decontaminateSemantic(
        e.filter(col("vec_id") % 19 =!= 0),
        e.filter(col("vec_id") % 19 === 0),
        "vec_id", "embedding", "embedding", threshold = 0.3)
      .orderBy("vec_id")
  }

  private val decontaminateSemanticOracle =
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % 19 = 0),
       |c AS (SELECT * FROM e WHERE vec_id % 19 <> 0),
       |m AS (
       |  SELECT c.vec_id,
       |    max(round(${dotSql("c", "b")} / (sqrt(c.nrm) * sqrt(b.nrm)), 6))
       |      AS max_cosine
       |  FROM c, b GROUP BY 1)
       |SELECT vec_id, max_cosine >= 0.3 AS contaminated, max_cosine
       |FROM m ORDER BY vec_id""".stripMargin

  // ---- semdedup_index ----------------------------------------------

  /** Incremental SemDeDup from a PERSISTED index
    * ([[graft.extra.SemanticIndex]] — the embedding-space member of
    * the incremental-dedup family beside `neardup_index` and
    * `dedup_substr_incremental`): the lower-id half of the embeddings
    * table is a content-keyed build-if-absent IVF-flat index (frozen
    * hash-order sample codebook, vectors cluster-partitioned on
    * storage), and the upper half arrives as the new batch — each
    * batch vector is a duplicate iff some same-cluster vector with a
    * SMALLER id (indexed or batch-mate) reaches rounded cosine 0.3,
    * `dup_of` the smallest such id. Since every indexed id sorts below
    * every batch id, that is exactly semDedup's global keep-min-id
    * rule over ALL vectors restricted to batch rows — which is what
    * the oracle replays (codebook sample, assignment, lower-id pair
    * rule, min-cand verdict).
    */
  def semdedupIndex(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val cut = e.agg(max("vec_id")).head().getLong(0) / 2
    val idxDir = IndexedCorpus.semanticDir(
      e.filter(col("vec_id") <= cut), "vec_id", "embedding")
    graft.extra.SemanticIndex.dedupBatch(s, idxDir,
        e.filter(col("vec_id") > cut), "vec_id", "embedding",
        threshold = 0.3)
      .orderBy("vec_id")
  }

  private val semdedupIndexOracle =
    s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
       |cut AS (SELECT max(vec_id) // 2 AS c FROM e),
       |corp AS (SELECT e.* FROM e, cut WHERE vec_id <= c),
       |cb AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM corp
       |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dotSql("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6)
       |        DESC, c.cid) AS crk
       |  FROM e v CROSS JOIN cb c),
       |asg AS (SELECT vec_id, cid AS cluster_id FROM asgr WHERE crk = 1),
       |pairs AS (
       |  SELECT b.vec_id, o.vec_id AS cand,
       |    round(${dotSql("b", "o")} / (sqrt(b.nrm) * sqrt(o.nrm)), 6)
       |      AS cos
       |  FROM e b JOIN asg ab ON ab.vec_id = b.vec_id
       |  JOIN cut ON b.vec_id > cut.c
       |  JOIN asg ao ON ao.cluster_id = ab.cluster_id
       |  JOIN e o ON o.vec_id = ao.vec_id AND o.vec_id < b.vec_id),
       |best AS (SELECT vec_id, cand, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cand) AS rk
       |  FROM pairs WHERE cos >= 0.3)
       |SELECT b.vec_id, ab.cluster_id,
       |  (x.cand IS NOT NULL) AS is_dup,
       |  x.cand AS dup_of, x.cos AS best_cos
       |FROM e b JOIN asg ab ON ab.vec_id = b.vec_id
       |JOIN cut ON b.vec_id > cut.c
       |LEFT JOIN (SELECT * FROM best WHERE rk = 1) x ON x.vec_id = b.vec_id
       |ORDER BY b.vec_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("semdedup_index",
      "incremental SemDeDup from the persisted IVF-flat index: " +
        "cluster-pruned corpus probe + batch-mate min-id verdicts",
      semdedupIndex, Some(semdedupIndexOracle)),
    QueryDef("decontaminate_semantic",
      "embedding-space benchmark decontamination: max rounded cosine " +
        "vs the eval-suite slice, loop-codegen projection (no join)",
      decontaminateSemantic, Some(decontaminateSemanticOracle)),
    QueryDef("sim_topk",
      "exact brute-force cosine top-5 for 10 query vectors",
      simTopK, Some(simTopKOracle)),
    QueryDef("sim_topk_int8",
      "int8-quantized integer-dot scan + exact float re-rank top-5",
      simTopKInt8, Some(simTopKInt8Oracle)),
    QueryDef("sim_topk_lsh",
      "sign-random-projection LSH bucketed approximate top-5",
      simTopKLsh, Some(simTopKLshOracle)),
    QueryDef("sim_topk_lsh_multi",
      "multi-table LSH (4x4-bit, ANY-table collision) approximate top-5",
      simTopKLshMulti, Some(simTopKLshMultiOracle)),
    QueryDef("sim_topk_ivf",
      "IVF coarse-quantizer top-5 (32 fixed centroids, nprobe=3)",
      simTopKIvf, Some(simTopKIvfOracle)),
    QueryDef("sim_topk_pq",
      "product-quantized (8x16 codebook) ADC top-5 + exact re-rank",
      simTopKPq, Some(simTopKPqOracle)),
    QueryDef("sim_topk_ivfpq",
      "IVF-PQ: 3 probed posting lists scored by PQ byte codes (ADC)",
      simTopKIvfPq, Some(simTopKIvfPqOracle)),
    QueryDef("sim_topk_ivfpq_residual",
      "residual-encoded IVF-PQ (codes quantize v - coarse[list]): " +
        "the clustered-corpus production default",
      simTopKIvfPqResidual, Some(simTopKIvfPqResidualOracle)),
    QueryDef("sim_topk_pq_trained",
      "PQ ADC top-5 with a Lloyd-trained (3-iter) codebook; rows-only",
      simTopKPqTrained, None))
}
