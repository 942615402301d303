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
}
