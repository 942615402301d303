package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.extra.{AnnIndex, Bm25Index, Retrieval, Similarity}
import graft.model.Tables
import graft.queries.TextQueriesImpl

/** Production hybrid retrieval over persisted indexes (r10 headline):
  * the registered `hybrid_topk_indexed` must be bit-identical to the
  * brute-force `hybrid_topk` (its exact-mode contract — that is what
  * lets the two share one DuckDB oracle), and the PRODUCTION
  * configuration (nprobe < lists, bounded shortlist) must serve
  * well-formed fused results from the same persisted layouts.
  */
class HybridIndexedSpec extends SparkSpec {

  test("hybrid_topk_indexed ≡ hybrid_topk bit-for-bit " +
      "(exact mode: all lists probed, untruncated shortlist)") {
    val brute = TextQueriesImpl.hybridTopK(spark, sfDir).collect().toSeq
    val indexed = TextQueriesImpl.hybridTopKIndexed(spark, sfDir)
      .collect().toSeq
    assert(indexed == brute)
  }

  test("production config (nprobe=3, candFactor=3) over the same " +
      "persisted indexes: well-formed per-query fusion, high overlap " +
      "with the exact fusion") {
    val dir = Files.createTempDirectory("hybrid_prod_idx").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    Bm25Index.build(docs, "doc_id", "text", s"$dir/bm25")
    val idx = AnnIndex.buildAndWriteIvfPq(emb, "vec_id", "embedding",
      s"$dir/ann").get
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val sparse = Bm25Index.searchAll(spark, s"$dir/bm25", queries,
        "query_id", "query_text", idCol = "doc_id", topK = 20)
      .withColumn("rank", row_number().over(ws))
    val dense = Similarity.searchIvfPq(idx, col("id") < 3, k = 20,
        nprobe = 3, candFactor = 3)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank"))
    val fused = Retrieval.rrfFuse(sparse, dense, "query_id", "doc_id",
        rrfK = 60, topK = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id")))
      .toSeq
    // well-formed: 3 queries × 10 ranked rows, ranks 1..10, no dup docs
    assert(fused.size == 30, s"expected 30 fused rows, got ${fused.size}")
    fused.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted == (1 to 10), s"ranks broken for q=$q")
      assert(rows.map(_._3).distinct.size == 10, s"dup docs for q=$q")
    }
    // the sparse arm is identical to the exact variant's and dominates
    // rank mass, so the approximate fusion must stay close: >= 6 of 10
    // fused docs per query shared with the exact fusion (measured 6-9
    // on the fixed sf0.001 tables; deterministic — a regression
    // tripwire, not a bound)
    val exact = TextQueriesImpl.hybridTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
      .toSet
    fused.groupBy(_._1).foreach { case (q, rows) =>
      val overlap = rows.count(r => exact.contains((r._1, r._3)))
      assert(overlap >= 6, s"query $q: only $overlap/10 overlap vs exact")
    }
  }
}
