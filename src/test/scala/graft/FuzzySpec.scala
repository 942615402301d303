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

  test("strings shorter than n produce the EMPTY gram array — " +
      "identical short strings and empty strings never pair") {
    // regression: sequence(1, 0) is the DESCENDING [1,0] in Spark, so
    // an unguarded charGrams emitted the whole short string (or "") as
    // a gram — every empty string then shared one uncapped hot block.
    val l = Seq((1L, "ab"), (2L, ""), (3L, "x")).toDF("id", "name")
    val r = Seq((10L, "ab"), (20L, ""), (30L, "x")).toDF("rid", "rname")
    assert(Fuzzy.fuzzyJoin(l, "id", "name", r, "rid", "rname",
      maxDist = 2).count() == 0)
    // direct check: the gram column is empty (not null, not [""])
    val grams = l.select(Fuzzy.charGrams(org.apache.spark.sql.functions
        .col("name"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(grams.forall(_.isEmpty))
  }

  test("hot-gram cap counts (side, key) pairs: equal-valued left and " +
      "right keys cannot collapse and let a gram evade the cap") {
    // 4 left + 4 right keys with IDENTICAL key values 1..4; the shared
    // grams ("xyz", "yz ") appear on all 8 (side,key) pairs -> df=8.
    // An untagged count over the merged key column would see only 4
    // distinct values, evade the cap of 6, and emit 16 candidates.
    val l = (1 to 4).map(i => (i.toLong, s"xyz l$i")).toDF("id", "name")
    val r = (1 to 4).map(i => (i.toLong, s"xyz r$i")).toDF("rid", "rname")
    val out = Fuzzy.fuzzyJoin(l, "id", "name", r, "rid", "rname",
      maxDist = 2, maxGramDf = Some(6))
    assert(out.count() == 0,
      "hot grams must be dropped when combined side-tagged df > cap")
    // sanity: without the cap the same pairs DO match (dist 2)
    assert(Fuzzy.fuzzyJoin(l, "id", "name", r, "rid", "rname",
      maxDist = 2).count() == 16)
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
