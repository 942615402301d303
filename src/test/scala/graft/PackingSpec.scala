package graft

import org.apache.spark.sql.functions._

import graft.extra.Packing

/** Greedy sequence packing: invariants, reference equality on a
  * hand-checked case, and layout independence.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(docs: Seq[(Long, Long)], budget: Long, shards: Int) =
    Packing.packGreedy(
      docs.toDF("doc_id", "toks"), "doc_id", col("toks"), budget, shards)
      .select("doc_id", "shard", "seq_id", "seq_pos", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("greedy fill: sequences respect the budget, docs stay in id " +
      "order, oversized docs sit alone") {
    // single shard so the fill order is the full id order
    val docs = Seq((1L, 300L), (2L, 200L), (3L, 13L), (4L, 600L), (5L, 1L))
    val out = pack(docs, budget = 512, shards = 1).sortBy(_._1)
    // doc1+doc2 = 500 ≤ 512; doc3 would make 513 → new seq; doc4 = 600
    // exceeds the budget alone → its own seq; doc5 follows in a new seq
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 2L, 0L),
        (5L, 3L, 0L)))
  }

  test("per-sequence totals never exceed the budget except for " +
      "single oversized docs; every doc appears exactly once") {
    val docs = (1L to 500L).map(i => i -> (1L + (i * 37) % 400))
    val out = pack(docs, budget = 512, shards = 8)
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    for (((_, _), grp) <- out.groupBy(r => (r._2, r._3))) {
      val total = grp.map(_._5).sum
      assert(total <= 512 || grp.length == 1,
        s"over-budget multi-doc sequence: $grp")
      // positions are 0..n-1 following id order
      assert(grp.sortBy(_._1).map(_._4).toSeq == grp.indices.map(_.toLong))
    }
  }

  test("output is independent of input partitioning") {
    val docs = (1L to 300L).map(i => i -> (1L + (i * 53) % 300))
    val a = pack(docs, budget = 256, shards = 4).sortBy(_._1).toSeq
    val b = Packing.packGreedy(
        docs.toDF("doc_id", "toks").repartition(17, col("toks")),
        "doc_id", col("toks"), 256, 4)
      .select("doc_id", "shard", "seq_id", "seq_pos", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }

  test("packStats reports fill against the budget") {
    val stats = Packing.packStats(
        Packing.packGreedy(
          Seq((1L, 300L), (2L, 200L), (3L, 13L)).toDF("doc_id", "toks"),
          "doc_id", col("toks"), 512, 1),
        "n_tokens", 512)
      .orderBy("seq_id")
      .collect()
    assert(stats.length == 2)
    assert(stats(0).getAs[Long]("n_docs") == 2 &&
      stats(0).getAs[Long]("seq_tokens") == 500)
    assert(stats(0).getAs[Double]("fill_ratio") == 0.976563) // round(500/512, 6)
    assert(stats(1).getAs[Long]("n_docs") == 1 &&
      stats(1).getAs[Long]("seq_tokens") == 13)
  }
}
