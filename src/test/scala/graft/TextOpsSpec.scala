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
