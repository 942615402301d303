package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-checked cases for the decontamination and repetition queries
  * (the oracle gate checks them at corpus scale; these pin the
  * semantics on inputs small enough to verify by eye).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table and run a registered query over it. */
  private def runOn(docs: Seq[(Long, String)], query: String) = {
    val dir = Files.createTempDirectory("textops").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.queries.Registry.byName(query).run(spark, dir)
  }

  test("decontaminate flags exactly the docs sharing a 5-gram with " +
      "the benchmark set") {
    val bench = "alpha beta gamma delta epsilon zeta" // doc 0: benchmark
    val out = runOn(Seq(
      0L -> bench,
      1L -> ("unrelated words here nothing shared at all " +
        "and still nothing shared"),
      2L -> ("prefix alpha beta gamma delta epsilon suffix"), // shares 5-gram
      3L -> "alpha beta gamma delta different tail"), // only 4-gram: clean
      "decontaminate")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
  }

  test("Text.decontaminate accepts an arbitrary benchmark frame " +
      "(eval suite as its own table, different text column name)") {
    val corpus = Seq(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "completely different content with no overlap whatsoever here",
      12L -> "prefix quick brown fox jumps over suffix")
      .toDF("doc_id", "text")
    // planted contamination: the eval prompt embeds the 5-gram
    // "quick brown fox jumps over" that docs 10 and 12 share
    val benchmark = Seq("question quick brown fox jumps over what answer")
      .toDF("prompt")
    val out = graft.extra.Text.decontaminate(corpus, benchmark,
      "doc_id", "text", "prompt", n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> true))
  }

  test("doc_repetition computes top-bigram and dup-token fractions") {
    val out = runOn(Seq(
      // bigrams: "a b","b a","a b","b c" -> top "a b" 2/4; tokens
      // 5 with 3 distinct -> dup 0.4
      1L -> "a b a b c"),
      "doc_repetition").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") == 4)
    assert(r.getAs[Long]("top_bigram_n") == 2)
    assert(r.getAs[Double]("top_bigram_frac") == 0.5)
    assert(r.getAs[Double]("dup_token_frac") == 0.4)
  }
}
