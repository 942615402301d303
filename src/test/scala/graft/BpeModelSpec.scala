package graft

import org.apache.spark.sql.functions._

import graft.extra.{BpeModel, Text}

/** Persisted BPE tokenizer model — SEQUENCE-exact round trips (rank
  * order is application order: a reordered merge list is a different
  * tokenizer), registry versioning across retrains, memoized loads,
  * and the serving surface.
  */
class BpeModelSpec extends SparkSpec {
  import spark.implicits._

  private val merges: Seq[(String, String)] = Seq(
    ("a", "b"), ("ab", "c"), ("d", "e"), ("ab", "ab"))

  test("save/load round-trips the merge SEQUENCE exactly (order, " +
      "multi-char symbols, repeated left symbol)") {
    val dir = java.nio.file.Files.createTempDirectory("bpem").toString
    val v = BpeModel.save(spark, merges, dir)
    assert(v == 1L)
    assert(BpeModel.load(spark, dir) == merges)
    // counts under the loaded list match counts under the in-memory
    // list on every tier
    val docs = Seq((1L, "abc abab de"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val direct = Text.withBpeTokens(docs, "text", merges)
      .select("doc_id", "n_bpe_tokens").collect().toSet
    val loaded = BpeModel.load(spark, dir)
    assert(Text.withBpeTokens(docs, "text", loaded)
      .select("doc_id", "n_bpe_tokens").collect().toSet == direct)
    assert(Text.withBpeTokensTyped(docs, "text", loaded)
      .select("doc_id", "n_bpe_tokens").collect().toSet == direct)
  }

  test("re-save is a new head version; loadVersion time-travels to " +
      "the prior tokenizer (corpus-reproducibility pin)") {
    val dir = java.nio.file.Files.createTempDirectory("bpem2").toString
    val v1 = BpeModel.save(spark, merges, dir)
    val retrained = Seq(("x", "y"), ("xy", "z"))
    val v2 = BpeModel.save(spark, retrained, dir)
    assert(v1 == 1L && v2 == 2L)
    assert(BpeModel.load(spark, dir) == retrained)
    assert(BpeModel.loadVersion(spark, dir, v1) == merges)
    // loads are memoized per (dir, head signature, version): the same
    // head query returns the SAME instance; a re-save invalidates
    val a = BpeModel.load(spark, dir)
    assert(a eq BpeModel.load(spark, dir))
    BpeModel.save(spark, merges, dir)
    assert(BpeModel.load(spark, dir) == merges)
  }

  test("empty list round-trips; empty-symbol rules and missing dirs " +
      "fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("bpem3").toString
    BpeModel.save(spark, Seq.empty, dir)
    assert(BpeModel.load(spark, dir).isEmpty)
    intercept[IllegalArgumentException] {
      BpeModel.save(spark, Seq(("", "b")), dir)
    }
    intercept[IllegalStateException] {
      BpeModel.load(spark,
        java.nio.file.Files.createTempDirectory("bpenone").toString)
    }
  }

  test("train commits a trainBpe list that encodes identically to " +
      "the direct list; tokenCounts serves (id, counts)") {
    val dir = java.nio.file.Files.createTempDirectory("bpem4").toString
    val docs = (1L to 40L).map(i =>
      (i, s"lower lowest newer newest wider widest s$i")).toDF(
      "doc_id", "text")
    BpeModel.train(docs, "text", numMerges = 12, dir)
    val committed = BpeModel.load(spark, dir)
    assert(committed == Text.trainBpe(docs, "text", 12))
    assert(committed.size == 12)
    val served = BpeModel.tokenCounts(spark, dir, docs, "doc_id", "text")
    assert(served.columns.toSeq ==
      Seq("doc_id", "n_tokens", "n_bpe_tokens"))
    val direct = Text.withBpeTokens(docs, "text", committed)
      .select("doc_id", "n_tokens", "n_bpe_tokens").collect().toSet
    assert(served.collect().toSet == direct)
  }
}
