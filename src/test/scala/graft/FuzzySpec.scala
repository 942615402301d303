package graft

import graft.extra.Fuzzy

/** Hand-checked fuzzy-join behavior (the oracle gate pins the full
  * candidate+verify pipeline at corpus scale).
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "golden gadget"), (2L, "silver widget"), (3L, "copper bolt"))
    .toDF("id", "name")

  test("one-edit variants match at dist 1; unrelated strings do not " +
      "match; exact copies match at dist 0") {
    val right = Seq(
      (10L, "golden gadgex"),  // 1 edit from id 1
      (20L, "silver widget"),  // exact copy of id 2
      (30L, "zzzzzz qqqqqq"))  // unrelated
      .toDF("rid", "rname")
    val out = Fuzzy.fuzzyJoin(left, "id", "name", right, "rid", "rname",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getInt(2)).toMap
    assert(out == Map((1L, 10L) -> 1, (2L, 20L) -> 0))
  }

  test("blocking requires a shared trigram: a 2-edit match with no " +
      "common gram is (documented) unreachable") {
    // "ab" is shorter than the trigram size -> no grams, no candidates
    val l = Seq((1L, "ab")).toDF("id", "name")
    val r = Seq((2L, "ax")).toDF("rid", "rname")
    assert(Fuzzy.fuzzyJoin(l, "id", "name", r, "rid", "rname",
      maxDist = 2).count() == 0)
  }

  test("hot-gram cap drops stopword grams but exact verify keeps " +
      "precision for the surviving candidates") {
    // every left name shares the ' th' grams via 'the'; cap kills them
    val l = (1 to 8).map(i => (i.toLong, s"the item$i"))
      .toDF("id", "name")
    val r = Seq((99L, "the item1")).toDF("rid", "rname")
    val capped = Fuzzy.fuzzyJoin(l, "id", "name", r, "rid", "rname",
      maxDist = 1, maxGramDf = Some(3))
    // 'item1'-specific grams survive the cap, so the true match remains
    val rows = capped.collect()
    assert(rows.exists(x => x.getLong(0) == 1L && x.getInt(2) == 0))
    // precision stays exact: no row beyond maxDist
    assert(rows.forall(_.getInt(2) <= 1))
  }
}
