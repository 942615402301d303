package graft

import graft.extra.Curation

/** Hand-built corpus exercising every curation verdict. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs to the old stone bridge in light rain"
  // same doc with one word appended: shingle jaccard ≈ 0.95 → near-dup
  private val near = good + " today"
  private val german =
    "der schnelle braune fuchs springt und rennt dann zu der alten steinernen bruecke bei leichtem regen heute morgen"

  private def verdicts = {
    val docs = Seq(
      (1L, good),
      (2L, good),   // exact duplicate of 1
      (3L, near),   // near duplicate of 1
      (4L, "too short to keep"),
      (5L, german))
      .toDF("doc_id", "text")
    Curation.curate(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
  }

  test("every verdict stage fires and kept rows carry a split") {
    val v = verdicts
    assert(v(1L)._1 == "kept")
    assert(v(2L)._1 == "exact_dup")
    assert(v(3L)._1 == "near_dup")
    assert(v(4L)._1 == "low_quality")
    assert(v(5L)._1 == "wrong_lang")
    assert(v(1L)._2.exists(Set("train", "val", "test")))
    // non-kept rows have no split
    assert(Seq(2L, 3L, 4L, 5L).forall(v(_)._2.isEmpty))
  }

  test("verdict is total: one row per input doc") {
    assert(verdicts.size == 5)
  }

  test("training pipeline composes end-to-end: curate → domain mixing " +
      "→ sequence packing, invariants hold at every stage") {
    import org.apache.spark.sql.functions._
    val docs = graft.gen.SyntheticDocs
    val n = 2000L
    val corpus = spark.range(n).select(
      col("id").as("doc_id"),
      docs.plantedText(col("id")).as("text"),
      concat(lit("src"), pmod(col("id"), lit(4))).as("source"))
    // stage 1: curation keeps the planted-dup corpus minus dups/junk
    val kept = Curation.curate(corpus, "doc_id", "text")
      .filter(col("status") === "kept").select("doc_id")
      .join(corpus, "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < n) // dups were actually removed
    // stage 2: mix — src0 upsampled 2x, src3 dropped
    val mixed = graft.extra.Sampling.mixDomains(kept, "doc_id", "source",
      Map("src0" -> 2.0, "src3" -> 0.0))
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src3"))
    val keptBySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 2 * keptBySrc("src0")) // whole epochs exact
    assert(bySrc("src1") == keptBySrc("src1"))
    // stage 3: pack the mixture — (doc, epoch) rows need a unique id
    val packed = graft.extra.Packing.packGreedy(
      mixed.withColumn("mix_id", col("doc_id") * 10 + col("epoch")),
      "mix_id", size(graft.extra.Text.tokens(col("text"))).cast("long"),
      budget = 128L, shards = 4)
    // every mixture row packed exactly once, budget respected
    assert(packed.count() == mixed.count())
    val over = graft.extra.Packing.packStats(packed, "n_tokens", 128L)
      .filter(col("n_docs") > 1 && col("seq_tokens") > 128).count()
    assert(over == 0)
  }
}
