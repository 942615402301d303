package graft

import org.apache.spark.sql.Row
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

  // ---- packExamples: trainer-ready token-id sequences ----------------

  private def ex(docs: Seq[(Long, Seq[String])], budget: Long,
      shards: Int, cap: Int = 65536) =
    Packing.packExamples(docs.toDF("doc_id", "syms"), "doc_id",
        col("syms"), budget, shards, cap)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("packExamples hand case: vocab ids by byte order, EOS=0 after " +
      "every doc and counted, oversize doc alone, empty doc costs 1") {
    val docs = Seq(
      1L -> Seq("a", "b"),                       // cost 3
      2L -> Seq("b"),                            // cost 2
      3L -> Seq("c", "a", "b"),                  // cost 4
      4L -> Seq.empty[String],                   // cost 1 (just EOS)
      5L -> Seq("d", "d", "d", "d", "d", "d"))   // cost 7 — oversize
    val out = ex(docs, budget = 6, shards = 1)
    // vocab sorted: a=1 b=2 c=3 d=4; fills: [1,2]=5 | [3,4]=5 | [5]=7
    assert(out == Seq(
      (0, 0L, 2L, 5L, "1,2,0,2,0"),
      (0, 1L, 2L, 5L, "3,1,2,0,0"),
      (0, 2L, 1L, 7L, "4,4,4,4,4,4,0")))
  }

  test("packExamples agrees with packGreedy's assignment: per-sequence " +
      "doc and token totals match, id-stream length is the token total") {
    val docs = (1L to 400L).map { i =>
      i -> (0L until (i * 13) % 17).map(j => s"s${(i * 31 + j) % 23}")
    }
    val df = docs.toDF("doc_id", "syms")
    val viaGreedy = Packing.packGreedy(df, "doc_id",
        (size(col("syms")) + 1).cast("long"), budget = 48, shards = 8)
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val out = ex(docs, budget = 48, shards = 8)
    assert(out.map(t => (t._1, t._2)).toSet == viaGreedy.keySet)
    for ((sh, seq, nd, nt, ids) <- out) {
      assert(viaGreedy((sh, seq)) == ((nd, nt)))
      val parts = ids.split(",")
      assert(parts.length.toLong == nt, s"id stream length vs n_tokens")
      assert(parts.count(_ == "0").toLong == nd, s"one EOS per doc")
    }
  }

  test("packExamples is independent of input partitioning") {
    val docs = (1L to 200L).map { i =>
      i -> (0L until (i * 7) % 11).map(j => s"t${(i + j) % 13}")
    }
    val a = ex(docs, budget = 32, shards = 4)
    val b = Packing.packExamples(
        docs.toDF("doc_id", "syms").repartition(17, col("syms")),
        "doc_id", col("syms"), 32, 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }

  test("packExamples rejects a vocabulary past vocabCap loudly; null " +
      "symbol arrays pack as empty docs") {
    val big = (1L to 10L).map(i => i -> Seq(s"u$i"))
    val e = intercept[IllegalArgumentException](ex(big, 16, 1, cap = 4))
    assert(e.getMessage.contains("vocabCap"))
    val withNull = Seq(Row(1L, Seq("a")), Row(2L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(withNull),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("syms",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    val out = Packing.packExamples(df, "doc_id", col("syms"), 16, 1)
      .orderBy("seq_id").collect()
    assert(out.length == 1 &&
      out(0).getAs[Long]("n_tokens") == 3L &&
      out(0).getAs[String]("token_ids") == "1,0,0")
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
