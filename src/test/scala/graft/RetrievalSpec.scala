package graft

import org.apache.spark.sql.functions._

import graft.extra.Retrieval

/** Hand-checked BM25 behavior on a corpus small enough to reason about
  * (the oracle gate pins the exact scores at corpus scale).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join spark"),   // 2 query terms, tf(spark)=2
    (2L, "spark window sort"),          // 1 query term
    (3L, "filler words only here"),     // no query terms
    (4L, "join join join join join"),   // rare-ish term, high tf
    (5L, "spark")                       // short doc: dl boost
  ).toDF("doc_id", "text")

  test("docs with no query term are absent; n_hits counts matched terms") {
    val out = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("spark", "shuffle", "join")).collect()
    val byId = out.map(r => r.getLong(0) -> r.getAs[Long]("n_hits")).toMap
    assert(!byId.contains(3L))
    assert(byId(1L) == 3L && byId(2L) == 1L && byId(4L) == 1L)
  }

  test("a doc matching more distinct query terms outscores one " +
      "repeating a single common term") {
    val out = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("spark", "shuffle", "join")).collect()
    val score = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    // doc 1 matches all three terms incl. the rarest (shuffle, df=1)
    assert(score(1L) > score(2L) && score(1L) > score(5L))
  }

  test("topK truncates and keeps the order total (score desc, id asc)") {
    val out = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("spark"), topK = 2).collect()
    assert(out.length == 2)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sorted.reverse.sameElements(scores))
  }

  test("bm25SearchAll with one query equals bm25Search (same scores, " +
      "same order)") {
    val q = Seq(("q", "spark shuffle join")).toDF("qid", "qtext")
    val multi = Retrieval.bm25SearchAll(corpus, "doc_id", "text",
      q, "qid", "qtext", topK = 10)
      .orderBy(col("score").desc, col("doc_id"))
      .select("doc_id", "n_hits", "score").collect()
    val single = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("spark", "shuffle", "join"), topK = 10).collect()
    assert(multi.map(_.toString).toSeq == single.map(_.toString).toSeq)
  }

  test("bm25SearchAll scores each query independently") {
    val q = Seq(("a", "spark"), ("b", "join")).toDF("qid", "qtext")
    val out = Retrieval.bm25SearchAll(corpus, "doc_id", "text",
      q, "qid", "qtext", topK = 10).collect()
    val byQ = out.groupBy(_.getString(0))
    // 'spark' matches docs 1, 2, 5; 'join' matches docs 1, 4
    assert(byQ("a").map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 5L))
    assert(byQ("b").map(_.getLong(1)).sorted.toSeq == Seq(1L, 4L))
  }

  test("query terms are lowercased and deduplicated") {
    val a = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("SPARK", "spark")).collect()
    val b = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("spark")).collect()
    assert(a.map(r => (r.getLong(0), r.getAs[Double]("score"))).toSeq ==
      b.map(r => (r.getLong(0), r.getAs[Double]("score"))).toSeq)
  }

  test("rrfFuse: hand-checked fusion — both-arm docs outrank " +
      "single-arm docs, missing arms contribute 0, ties break by id") {
    // query q: sparse ranks docs 1,2,3; dense ranks docs 2,3,4
    val sparse = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("qid", "doc_id", "rank")
    val dense = Seq(("q", 2L, 1), ("q", 3L, 2), ("q", 4L, 3))
      .toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, "qid", "doc_id",
        rrfK = 60, topK = 10)
      .collect()
      .sortBy(_.getInt(1))
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)), Option(r.get(5))))
    def rrf(rs: Option[Int], rd: Option[Int]) = BigDecimal(
      rs.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2: 1/62 + 1/61; doc 3: 1/63 + 1/62; doc 1: 1/61; doc 4: 1/63
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1, 2L), (2, 3L), (3, 1L), (4, 4L)))
    assert(out.map(_._3).toSeq == Seq(
      rrf(Some(2), Some(1)), rrf(Some(3), Some(2)),
      rrf(Some(1), None), rrf(None, Some(3))))
    // arm ranks surface (and are NULL where the arm missed the doc)
    assert(out.map(t => (t._4, t._5)).toSeq == Seq(
      (Some(2), Some(1)), (Some(3), Some(2)),
      (Some(1), None), (None, Some(3))))
  }

  test("evalMetrics: hand-computed partial-hit, perfect and " +
      "zero-relevance queries at k=4") {
    // qA: ranks 10,11,12,13 by score; relevant {11, 13, 99} → hits at
    // rk 2 and 4, one judged doc (99) unretrieved.
    // qB: single retrieved doc, relevant → all metrics 1.0 (dcg==idcg).
    // qC: no relevant docs at all → recall/mrr/ndcg 0.0, not NULL.
    val run = Seq(
      ("qA", 10L, 4.0), ("qA", 11L, 3.0), ("qA", 12L, 2.0),
      ("qA", 13L, 1.0),
      ("qB", 20L, 9.0),
      ("qC", 30L, 5.0), ("qC", 31L, 4.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(("qA", 11L), ("qA", 13L), ("qA", 99L), ("qB", 20L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalMetrics(run, "query_id", "doc_id", "score",
        qrels, k = 4)
      .collect()
      .map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2),
        r0.getLong(3), r0.getDouble(4), r0.getDouble(5),
        r0.getDouble(6), r0.getDouble(7)))
      .toSeq
    // qA: dcg = r9(1/log2 3) + r9(1/log2 5); idcg over min(3,4)=3
    // ideal ranks; ndcg = 1.061606312 / 2.130929754 → 0.498189
    assert(out == Seq(
      ("qA", 3L, 4L, 2L, 0.5, 0.666667, 0.5, 0.498189),
      ("qB", 1L, 1L, 1L, 0.25, 1.0, 1.0, 1.0),
      ("qC", 0L, 2L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("evalMetrics: duplicate qrels judgments and duplicate run rows " +
      "do not inflate hits/n_ret (ADVICE r13 dedup guard)") {
    val run = Seq(
      ("q", 1L, 5.0), ("q", 1L, 4.0), // duplicate ranked doc
      ("q", 2L, 3.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(("q", 1L), ("q", 1L), ("q", 9L)) // duplicate judgment
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalMetrics(run, "query_id", "doc_id", "score",
      qrels, k = 4).collect().head
    // n_rel = 2 distinct judged (1, 9); n_ret = 2 distinct ranked;
    // hits = 1 — without the dedup, the fan-out would report 2+ hits
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((2L, 2L, 1L)))
    assert(out.getDouble(5) == 0.5) // recall = 1/2
  }

  test("evalMetricsGraded: hand-computed graded fixture — exponential-" +
      "gain nDCG, per-query average precision, zero-relevance floor") {
    // qA ranks 1..4 = docs 10(gain 1), 11(gain 3), 12(-), 13(-);
    // judged but unretrieved: doc 99 (gain 2).
    //   dcg  = r9(1/log2 2) + r9(7/log2 3)          = 5.416508275
    //   idcg = r9(7/log2 2) + r9(3/log2 3) + r9(1/log2 4)
    //        = 9.392789261 → ndcg_graded = 0.576667
    //   AP   = (r9(1/1) + r9(2/2)) / 3 = 0.666667
    // qB: one retrieved doc, gain 2 → everything 1.0 (dcg == idcg).
    // qC: no positive judgment → metrics 0.0, never NULL.
    val run = Seq(
      ("qA", 10L, 4.0), ("qA", 11L, 3.0), ("qA", 12L, 2.0),
      ("qA", 13L, 1.0),
      ("qB", 20L, 9.0),
      ("qC", 30L, 5.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(
      ("qA", 10L, 1), ("qA", 11L, 3), ("qA", 99L, 2),
      ("qB", 20L, 2),
      ("qC", 30L, 0)) // judged not-relevant: gain 0 is not a hit
      .toDF("query_id", "doc_id", "gain")
    val out = Retrieval.evalMetricsGraded(run, "query_id", "doc_id",
        "score", qrels, "gain", k = 4)
      .collect()
      .map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2),
        r0.getLong(3), r0.getDouble(4), r0.getDouble(5),
        r0.getDouble(6), r0.getDouble(7), r0.getDouble(8)))
      .toSeq
    assert(out == Seq(
      ("qA", 3L, 4L, 2L, 0.5, 0.666667, 1.0, 0.666667, 0.576667),
      ("qB", 1L, 1L, 1L, 0.25, 1.0, 1.0, 1.0, 1.0),
      ("qC", 0L, 1L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("evalMetricsGraded: a perfectly gain-ordered run scores " +
      "ndcg_graded exactly 1.0; duplicate graded judgments keep max " +
      "gain") {
    val run = Seq(("q", 1L, 9.0), ("q", 2L, 8.0), ("q", 3L, 7.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(("q", 1L, 3), ("q", 1L, 1), // dup judgment: max = 3
      ("q", 2L, 2), ("q", 3L, 1))
      .toDF("query_id", "doc_id", "gain")
    val out = Retrieval.evalMetricsGraded(run, "query_id", "doc_id",
      "score", qrels, "gain", k = 3).collect().head
    assert(out.getLong(1) == 3L)          // n_rel: dedup kept 3 docs
    assert(out.getDouble(8) == 1.0)       // ndcg_graded
    assert(out.getDouble(7) == 1.0)       // avg_precision
  }

  test("evalMetrics ranks by (score desc, id asc): a score tie cannot " +
      "reorder metrics between engines") {
    val run = Seq(("q", 2L, 1.0), ("q", 1L, 1.0), ("q", 3L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq(("q", 1L)).toDF("query_id", "doc_id")
    val out = Retrieval.evalMetrics(run, "query_id", "doc_id", "score",
      qrels, k = 3).collect().head
    // tie broken by doc_id: 1 ranks first → mrr = 1.0
    assert(out.getDouble(6) == 1.0)
  }
}
