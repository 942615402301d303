package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval over a document corpus: BM25 top-k search (the
  * sparse complement to [[Similarity]]'s dense ANN — together they are
  * the two retrieval arms of a training-data / RAG pipeline).
  *
  * Scale shape: one tokenize+explode shuffle builds the (doc, term, tf)
  * frame; doc length comes from re-aggregating THAT frame (the raw text
  * is scanned exactly once); the query-term filter cuts the frame to
  * `|query| × df(term)` rows before any join, and the per-term df/idf
  * frame (|query| rows) broadcasts. Nothing downstream of the first
  * shuffle is proportional to corpus token count except the keyed dl
  * re-aggregation.
  *
  * Determinism: tf/dl/df are exact longs; idf and the per-term BM25
  * contribution are single fixed-order double formulas rounded to 12 dp,
  * summed per doc in DECIMAL (order-independent), rounded to 6 dp. The
  * top-k order is (score DESC, doc id ASC) — total, engine-identical.
  */
object Retrieval {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene/ATIRE
    * shifted form — always positive). Only docs matching ≥1 query term
    * appear; ties at equal rounded score break by ascending doc id.
    *
    * Output: idCol, `n_hits` (matched query terms), `score`.
    */
  /** Corpus BM25 scalars as a ONE-ROW LAZY frame (r17 — r16 fused the
    * old two sequential actions into one job; this removes the
    * remaining driver action entirely): (`__ndocs`, `__sumdl`, and the
    * derived `__avgdl` double). Cross-joined (broadcast) into the
    * scoring plan, the aggregation executes INSIDE the caller's single
    * action as a broadcast build instead of as its own collect +
    * planning round trip. The values are the same exact longs (the
    * token-length sum over the docs frame equals the sum over the tf
    * frame exactly — null/empty text contributes no tf rows and a 0
    * length here), and `__avgdl` is the same one IEEE division the
    * collected-scalar form performed on the driver, so every
    * downstream double is bit-identical.
    */
  private[graft] def bm25ConstsFrame(docs: DataFrame,
      textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("__ndocs"),
        coalesce(sum(size(Text.tokens(col(textCol))).cast("long")),
          lit(0L)).as("__sumdl"))
      .withColumn("__avgdl",
        col("__sumdl").cast("double") / col("__ndocs").cast("double"))

  /** Attach the [[bm25ConstsFrame]] scalars to every row of `df`:
    * `crossJoin(broadcast(…))` of the ONE-ROW aggregate — the
    * DataFrame spelling of a scalar subquery, linear by construction.
    * It plans as `BroadcastNestedLoopJoin BuildRight, Cross`
    * (a literal-key equi-join was tried and FoldablePropagation folds
    * the condition away, landing on the same operator); PlanShapeSpec
    * distinguishes this deliberate one-row attach from accidental
    * all-pairs joins.
    */
  private def withConsts(df: DataFrame, consts: DataFrame): DataFrame =
    df.crossJoin(broadcast(consts))

  /** The per-(doc, term) frequency frame — BM25's inverted-index core,
    * shared (r16) so eval callers can derive their judgment sets from
    * the SAME tokenization instead of paying a second
    * tokenize+explode+distinct chain over the corpus.
    */
  private[graft] def bm25Tf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct

    val tf = bm25Tf(docs, idCol, textCol).persist()
    // house cache-lifecycle rule (SCALE.md): eagerly materialize the
    // output, then unpersist — nothing stays cached past the call
    try {
      // corpus scalars ride the plan as a broadcast one-row frame
      // (r17): no separate driver collect — see bm25ConstsFrame
      val consts = bm25ConstsFrame(docs, textCol)
      val nDocsD = col("__ndocs").cast("double")
      val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))

      val tfq = tf.filter(col("term").isin(terms: _*))
      val df = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idf = withConsts(df, consts)
        .withColumn("idf",
          log((nDocsD - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0)))

      val tfD = col("tf").cast("double")
      val contrib = round(
        col("idf") * ((tfD * lit(k1 + 1.0)) /
          (tfD + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("dl").cast("double") / col("__avgdl"))))),
        12).cast(DecimalType(30, 12))

      Dedup.materialize(
        tfq.join(broadcast(idf.select("term", "idf", "__avgdl")), "term")
          .join(dl, idCol)
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_hits"),
            round(sum(contrib).cast("double"), 6).as("score"))
          .orderBy(col("score").desc, col(idCol))
          .limit(topK))
    } finally tf.unpersist(blocking = false)
  }

  /** Multi-query BM25 — the production retrieval shape: `queries` is an
    * ARBITRARY frame of (query id, query text), the same lesson as
    * decontamination's benchmark frame (eval/query sets live in their
    * own small table). One corpus tokenization (persisted tf, dl
    * re-aggregated from it), the query frame tokenizes and broadcasts;
    * a doc-term row fans out only to the queries containing that term,
    * df/idf is counted once per TERM (not per query), and the per-query
    * top-k is a rank window partitioned by query id over the scored
    * rows — never a global sort. Scoring arithmetic is identical to
    * [[bm25Search]] (12-dp DECIMAL contribution sums).
    *
    * Output: queryIdCol, idCol, `n_hits`, `score` — topK rows per
    * query, ties at equal rounded score broken by ascending doc id.
    */
  def bm25SearchAll(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val tf = bm25Tf(docs, idCol, textCol).persist()
    try {
      Dedup.materialize(bm25ScoredAll(tf, idCol,
        bm25ConstsFrame(docs, textCol), queries,
        queryIdCol, queryTextCol, k1, b, topK))
    } finally tf.unpersist(blocking = false)
  }

  /** The LAZY scoring core of [[bm25SearchAll]], over a caller-owned
    * (ideally pinned) tf frame and the lazy one-row corpus-scalar
    * frame ([[bm25ConstsFrame]]) — shared (r16) with the
    * retrieval-eval queries so a run + its corpus-derived qrels
    * execute as ONE plan over ONE tokenization; r17 folds the corpus
    * scalars into that same plan, so the whole query is a single
    * action.
    */
  private[graft] def bm25ScoredAll(tf: DataFrame, idCol: String,
      consts: DataFrame, queries: DataFrame, queryIdCol: String,
      queryTextCol: String, k1: Double, b: Double,
      topK: Int): DataFrame = {
    val nDocsD = col("__ndocs").cast("double")
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val qterms = queries.select(col(queryIdCol),
        explode(Text.tokens(col(queryTextCol))).as("term"))
      .distinct()
    val terms = qterms.select("term").distinct()
    val tfq = tf.join(broadcast(terms), "term")
    val idf = withConsts(
      tfq.groupBy(col("term")).agg(count(lit(1)).as("df")), consts)
      .withColumn("idf",
        log((nDocsD - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))

    val tfD = col("tf").cast("double")
    val contrib = round(
      col("idf") * ((tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / col("__avgdl"))))),
      12).cast(DecimalType(30, 12))

    val scored = tfq
      .join(broadcast(qterms), "term")
      .join(broadcast(idf.select("term", "idf", "__avgdl")), "term")
      .join(dl, idCol)
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(contrib).cast("double"), 6).as("score"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topK)
      .drop("__rank")
  }

  /** Reciprocal-rank fusion of the two retrieval arms — sparse
    * ([[bm25SearchAll]]) and dense ([[Similarity]] top-k) — over a
    * shared query frame: fused score = Σ_arm 1/(rrfK + rank_arm), the
    * standard rank-only fusion (robust to the arms' incomparable score
    * scales). Each input must carry (queryIdCol, idCol, `rank`) with
    * 1-based ranks; an id absent from one arm contributes 0 for it.
    *
    * Engine-exact by construction: ranks are integers, each reciprocal
    * is one IEEE double division, the sum is two terms (fixed order),
    * rounded to 6 dp; ties break by ascending id. So the fusion
    * oracles exactly even though the arms' scores are floats.
    *
    * Scale shape: both arms are ALREADY per-query top-k frames (Q·k
    * rows, corpus-independent), so the full-outer equijoin on
    * (query, id) and the per-query rank window are constant-bounded —
    * fusion cost never grows with the corpus.
    *
    * Output: queryIdCol, `rank`, idCol, `rrf_score`, `sparse_rank`,
    * `dense_rank` (arm ranks NULL where the arm missed the id).
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, queryIdCol: String,
      idCol: String, rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val s = sparse.select(col(queryIdCol), col(idCol),
      col("rank").as("sparse_rank"))
    val d = dense.select(col(queryIdCol), col(idCol),
      col("rank").as("dense_rank"))
    val fused = s.join(d, Seq(queryIdCol, idCol), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("sparse_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)),
        6))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(queryIdCol), col("rank"), col(idCol),
        col("rrf_score"), col("sparse_rank"), col("dense_rank"))
  }

  /** Ranking-quality EVAL over a retrieval run — the harness stage
    * every retrieval pipeline ends in (TREC convention, binary
    * relevance): per query, precision@k / recall@k / MRR@k / nDCG@k
    * against a relevance-judgment frame.
    *
    *   - `run`: (queryIdCol, idCol, scoreCol) rows — any arm's output
    *     (BM25, dense, fused). Ranks are derived HERE via
    *     `row_number` over (score desc, id asc), the library-wide
    *     deterministic tie order, so float-scored arms evaluate
    *     engine-identically.
    *   - `qrels`: (queryIdCol, idCol) binary judgments — one row per
    *     relevant (query, doc).
    *
    * Engine-exact arithmetic (the house DECIMAL discipline): each
    * DCG/IDCG term `1/log2(rank+1)` is rounded to 9 dp and summed as
    * DECIMAL(20,9) — ulp-level `log2` differences between engines
    * cannot flip a 6-dp final rounding. IDCG expands
    * `min(n_rel, k)` ideal ranks per query (a tiny explode, ≤ k rows
    * per query). Queries with no relevant docs score 0.0 across
    * recall/MRR/nDCG rather than NULL.
    *
    * Scale shape: the run is already per-query top-k (Q·k rows,
    * corpus-independent); qrels joins are keyed equijoins; every
    * aggregation is per-query. Nothing here grows with the corpus —
    * eval cost is O(Q·k + |qrels|).
    *
    * Output per query: `n_rel`, `n_ret`, `hits`, `precision_at_k`,
    * `recall_at_k`, `mrr`, `ndcg`, ordered by query id.
    */
  def evalMetrics(run: DataFrame, queryIdCol: String, idCol: String,
      scoreCol: String, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = DecimalType(20, 9)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    // malformed inputs must not skew the metrics (ADVICE r13: a
    // duplicate ranked row or judgment would fan the left join out and
    // inflate hits/n_ret): collapse the run to one row per (query,
    // doc) keeping the best score, and the qrels to distinct pairs
    val ranked = run
      .groupBy(col(queryIdCol), col(idCol))
      .agg(max(col(scoreCol)).as(scoreCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
    val rel = qrels.select(col(queryIdCol), col(idCol)).distinct()
      .select(col(queryIdCol), col(idCol), lit(1L).as("__rel"))
    val j = ranked.join(rel, Seq(queryIdCol, idCol), "left")
      .select(col(queryIdCol), col("__rk"),
        coalesce(col("__rel"), lit(0L)).as("__rel"))
    val dcgTerm = round(lit(1.0) / log2(col("__rk") + lit(1)), 9)
      .cast(dec)
    val perQ = j.groupBy(queryIdCol).agg(
      count(lit(1)).as("n_ret"),
      sum("__rel").as("hits"),
      min(when(col("__rel") === 1L, col("__rk"))).as("__frr"),
      sum(when(col("__rel") === 1L, dcgTerm)
        .otherwise(lit(0).cast(dec))).as("__dcg"))
    val nrel = rel.groupBy(queryIdCol)
      .agg(count(lit(1)).as("n_rel"))
    // ideal DCG: the first min(n_rel, k) ranks all relevant — same
    // 9-dp DECIMAL terms so dcg == idcg exactly for a perfect run
    val idcg = nrel.filter(col("n_rel") >= 1L)
      .select(col(queryIdCol),
        explode(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))))
          .as("__i"))
      .select(col(queryIdCol),
        round(lit(1.0) / log2(col("__i") + lit(1)), 9).cast(dec)
          .as("__t"))
      .groupBy(queryIdCol).agg(sum("__t").as("__idcg"))
    perQ
      .join(nrel, Seq(queryIdCol), "left")
      .join(idcg, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_ret"), col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6)
          .as("precision_at_k"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(
            col("hits").cast("double") / col("n_rel").cast("double"), 6))
          .as("recall_at_k"),
        when(col("__frr").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("__frr").cast("double"), 6))
          .as("mrr"),
        when(col("__idcg").isNull, lit(0.0))
          .otherwise(round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6))
          .as("ndcg"))
      .orderBy(queryIdCol)
  }

  /** GRADED-relevance eval (the TREC graded-qrels convention) — the
    * judgment frame carries a `gainCol` (integer gain ≥ 0; 0 =
    * judged-not-relevant), and the harness adds the two metrics binary
    * judgments can't express:
    *
    *   - `ndcg_graded`: DCG term = (2^gain − 1) / log2(rank + 1) (the
    *     Burges/TREC exponential gain form); IDCG ranks the query's
    *     judged gains descending (ties by doc id) and takes the top
    *     min(judged, k). Perfect-ordering runs score exactly 1.0 —
    *     same 9-dp-rounded DECIMAL(20,9) term discipline as the
    *     binary [[evalMetrics]], so engines can't diverge on log2
    *     ulps.
    *   - `avg_precision` (per-query AP; MAP = its mean over queries):
    *     AP = Σ_{rel ranks i ≤ k} P(i) / n_rel with P(i) = cumulative
    *     hits at i / i, each term rounded 9 dp and summed in DECIMAL
    *     (binary relevance gain > 0, denominator the FULL judged
    *     relevant count — the TREC convention where ranks beyond the
    *     cut contribute 0).
    *
    * precision/recall@k, MRR and the hit counts are the binary
    * metrics over gain > 0, identical to [[evalMetrics]]'s. Inputs
    * are deduplicated the same way (run → max score per (query, doc),
    * qrels → max gain per (query, doc)); queries with no positive
    * judgment score 0.0 everywhere.
    *
    * Scale shape unchanged: O(Q·k + |qrels|), corpus-independent;
    * the cumulative-hits window is per-query over ≤ k rows.
    *
    * Output per query: `n_rel`, `n_ret`, `hits`, `precision_at_k`,
    * `recall_at_k`, `mrr`, `avg_precision`, `ndcg_graded`, ordered by
    * query id.
    */
  def evalMetricsGraded(run: DataFrame, queryIdCol: String,
      idCol: String, scoreCol: String, qrels: DataFrame,
      gainCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = DecimalType(20, 9)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val ranked = run
      .groupBy(col(queryIdCol), col(idCol))
      .agg(max(col(scoreCol)).as(scoreCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
    val rel = qrels
      .groupBy(col(queryIdCol), col(idCol))
      .agg(max(col(gainCol)).cast("long").as("__gain"))
    val j = ranked.join(rel, Seq(queryIdCol, idCol), "left")
      .select(col(queryIdCol), col("__rk"),
        coalesce(col("__gain"), lit(0L)).as("__gain"))
      .withColumn("__rel",
        when(col("__gain") > 0L, lit(1L)).otherwise(lit(0L)))
    // cumulative hits through rank i — per-query, ≤ k rows, so the
    // running-sum window never sees more than k rows per partition
    val wc = Window.partitionBy(col(queryIdCol)).orderBy(col("__rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = j.withColumn("__cum", sum("__rel").over(wc))
    val dcgTerm = round(
      (pow(lit(2.0), col("__gain").cast("double")) - lit(1.0)) /
        log2(col("__rk") + lit(1)), 9).cast(dec)
    val apTerm = round(
      col("__cum").cast("double") / col("__rk").cast("double"), 9)
      .cast(dec)
    val zero = lit(0).cast(dec)
    val perQ = withCum.groupBy(queryIdCol).agg(
      count(lit(1)).as("n_ret"),
      sum("__rel").as("hits"),
      min(when(col("__rel") === 1L, col("__rk"))).as("__frr"),
      sum(when(col("__rel") === 1L, dcgTerm).otherwise(zero))
        .as("__dcg"),
      sum(when(col("__rel") === 1L, apTerm).otherwise(zero))
        .as("__apsum"))
    val pos = rel.filter(col("__gain") > 0L)
    val nrel = pos.groupBy(queryIdCol)
      .agg(count(lit(1)).as("n_rel"))
    // ideal DCG: the query's judged gains in descending order (ties
    // by doc id — the library tie discipline), top min(judged, k)
    val wi = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__gain").desc, col(idCol))
    val idcg = pos
      .withColumn("__i", row_number().over(wi))
      .filter(col("__i") <= k)
      .select(col(queryIdCol),
        round((pow(lit(2.0), col("__gain").cast("double")) - lit(1.0)) /
          log2(col("__i") + lit(1)), 9).cast(dec).as("__t"))
      .groupBy(queryIdCol).agg(sum("__t").as("__idcg"))
    perQ
      .join(nrel, Seq(queryIdCol), "left")
      .join(idcg, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_ret"), col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6)
          .as("precision_at_k"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(
            col("hits").cast("double") / col("n_rel").cast("double"), 6))
          .as("recall_at_k"),
        when(col("__frr").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("__frr").cast("double"), 6))
          .as("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("__apsum").cast("double") /
            col("n_rel").cast("double"), 6))
          .as("avg_precision"),
        when(col("__idcg").isNull ||
            col("__idcg") === lit(0).cast(dec), lit(0.0))
          .otherwise(round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6))
          .as("ndcg_graded"))
      .orderBy(queryIdCol)
  }
}
