package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: approximate string matching between two keyed
  * tables — the record-linkage primitive (supplier name vs invoice
  * name, product title vs listing title). Same philosophy as the
  * near-dup family: candidates come from a BLOCKING equijoin (shared
  * character n-gram), the expensive exact measure (Levenshtein) runs
  * only on the candidate pairs, never all-pairs.
  */
object Fuzzy {

  /** Character n-grams of a string column, distinct. Strings shorter
    * than `n` (and NULLs) produce the EMPTY array — no grams, therefore
    * no candidates; callers matching very short keys should lower `n`.
    *
    * The `length >= n` guard is load-bearing, not cosmetic: Spark's
    * `sequence(1, 0)` evaluates to the DESCENDING array `[1, 0]`, so an
    * unguarded version emits the whole short string (or `""` for empty
    * strings) as a "gram". Every empty string would then share the `""`
    * gram — one uncapped hot block pairing ALL empty strings, exactly
    * the quadratic blowup the blocking design exists to avoid — and the
    * semantics would diverge from a SQL oracle's empty
    * `range(1, length-n+1)`.
    */
  def charGrams(text: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - lit(n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fuzzy join: pairs (left, right) with `levenshtein ≤ maxDist`,
    * candidates blocked on shared character n-grams. The blocking is
    * the standard recall heuristic (strings within k edits share a
    * gram unless shorter than ~k·n); the verify step is exact, so
    * precision is exact. `maxGramDf` (optional) drops grams appearing
    * in more than that many DISTINCT left/right keys before the
    * candidate join — the hot-bucket cap that keeps one stopword-gram
    * from turning the equijoin quadratic at corpus scale (same rule as
    * the LSH bucket cap; dropped grams only cost recall for pairs
    * whose ONLY shared gram was the hot one).
    *
    * Scale shape: two explode-projections, one keyed equijoin on gram,
    * a distinct on (left key, right key), and the Levenshtein verify
    * on candidates only. Self-pairs (same key both sides) are kept —
    * callers diffing a table against a corrupted/evolved version of
    * itself usually want them; filter afterwards if not.
    *
    * Output: leftKey, rightKey, `dist` (≤ maxDist).
    */
  def fuzzyJoin(left: DataFrame, leftKey: String, leftText: String,
      right: DataFrame, rightKey: String, rightText: String,
      maxDist: Int, n: Int = 3,
      maxGramDf: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val lg = left.select(col(leftKey).as("__lk"),
        col(leftText).as("__lt"))
      .withColumn("__g", explode(charGrams(col("__lt"), n)))
    val rg = right.select(col(rightKey).as("__rk"),
        col(rightText).as("__rt"))
      .withColumn("__g", explode(charGrams(col("__rt"), n)))
    val (lgc, rgc) = maxGramDf match {
      case Some(cap) =>
        // df = distinct (side, key) pairs: the side tag keeps a left key
        // and a right key with the SAME value from collapsing into one —
        // untagged, a gram could evade the cap with up to 2× the
        // intended df, and the cap is the quadratic-blowup guard, so it
        // must be tight. The tagged pair is hashed to ONE long before
        // the distinct: the exact-distinct shuffle then carries
        // (gram, 8B) instead of (gram, side, full key string) — 3×
        // lighter at corpus scale (FuzzySmoke measured the string form
        // spilling at 10⁶ names / 5·10⁷ gram rows). A 64-bit collision
        // undercounts a df by 1 against caps in the thousands —
        // immaterial to a blowup threshold.
        // NULL keys are dropped BEFORE hashing: count_distinct ignored
        // NULL keys in the pre-hash form, but xxhash64 skips NULL args
        // (hashing just the side tag), so an unfiltered NULL key would
        // add a phantom distinct value per side — keep the exact prior
        // df semantics instead
        val hot = lg.filter(col("__lk").isNotNull)
          .select(col("__g"),
            xxhash64(lit("l"), col("__lk").cast("string")).as("__sk"))
          .union(rg.filter(col("__rk").isNotNull)
            .select(col("__g"),
              xxhash64(lit("r"), col("__rk").cast("string")).as("__sk")))
          .groupBy("__g")
          .agg(count_distinct(col("__sk")).as("__df"))
          .filter(col("__df") > cap)
          .select("__g")
        (lg.join(broadcast(hot), Seq("__g"), "left_anti"),
          rg.join(broadcast(hot), Seq("__g"), "left_anti"))
      case None => (lg, rg)
    }
    lgc.join(rgc, "__g")
      .select("__lk", "__lt", "__rk", "__rt").distinct()
      .withColumn("dist", levenshtein(col("__lt"), col("__rt")))
      .filter(col("dist") <= maxDist)
      .select(col("__lk").as(leftKey + "_l"),
        col("__rk").as(rightKey + "_r"), col("dist"))
  }
}
