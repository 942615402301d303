package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Join-side runtime filtering for large⋈large joins.
  *
  * The problem shape: a selective predicate on one fact table leaves
  * few distinct join keys, but the OTHER side is 100 TB — and a plain
  * shuffle join moves ALL of it, though most rows join to nothing.
  * Catalyst's own runtime filter (`InjectRuntimeFilter`) does exactly
  * what [[bloomPrefilteredJoin]] does when statistics let it; this is
  * the explicit, deterministic form for when the planner can't see the
  * selectivity (post-transform keys, no stats) — the same reason
  * [[Skew]] exists beside AQE's skew join.
  */
object Joins {

  /** Serialized Bloom filter over `xxhash64(keys)` of `df`: ONE
    * distributed aggregation pass (partial filters built per
    * partition, OR-merged on the reducer — Spark's own
    * `BloomFilterAggregate`, the engine's runtime-filter sketch), and
    * only the finished filter — O(numBits), data-size-independent —
    * reaches the driver. This is precisely the data movement of the
    * planner-injected bloom subquery.
    */
  def keyBloom(df: DataFrame, keys: Seq[Column], expectedKeys: Long,
      numBits: Long): Array[Byte] = {
    val child = GraftColumnBridge.expression(xxhash64(keys: _*))
    val agg = new BloomFilterAggregate(child,
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    df.select(GraftColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe column against a serialized filter from
    * [[keyBloom]] — Spark's codegen `might_contain`, with the filter
    * embedded as a literal (broadcast once with the task binary).
    */
  def mightContain(bloom: Array[Byte], keys: Seq[Column]): Column =
    GraftColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftColumnBridge.expression(xxhash64(keys: _*))))

  /** ~1% fpp sizing: -n·ln(p)/ln(2)², capped at `maxNumBits`. */
  def optimalNumBits(expectedKeys: Long, fpp: Double,
      maxNumBits: Long = 1L << 26): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bits = (-expectedKeys * math.log(fpp) /
      (math.log(2) * math.log(2))).ceil.toLong
    math.min(math.max(bits, 64L), maxNumBits)
  }

  /** Shuffle join with a Bloom prefilter on the big side: build the
    * filter over `small`'s keys (one pass, fixed size), drop `big`
    * rows whose keys can't match BEFORE the shuffle, then run the
    * normal equijoin. False positives only admit a few extra rows into
    * the shuffle — the equijoin verifies exactly, so the result is
    * bit-identical to the plain join. Cuts the dominant cost (the big
    * side's shuffle write/read) by the small side's key selectivity.
    *
    * `joinType` is restricted to inner/left_semi (big side left):
    * pre-dropping big rows is only sound when unmatched big rows are
    * absent from the result anyway. `expectedKeys` sizes the filter;
    * the default 0 auto-sizes with one count() of the small side.
    */
  def bloomPrefilteredJoin(big: DataFrame, bigKeys: Seq[String],
      small: DataFrame, smallKeys: Seq[String],
      expectedKeys: Long = 0L, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(bigKeys.nonEmpty && bigKeys.size == smallKeys.size,
      s"key lists must be non-empty and same-length, got " +
        s"$bigKeys vs $smallKeys")
    // auto-size by default: one count() over the SMALL (already
    // filtered) side — trivial next to the shuffle it tunes. An
    // under-sized filter is only a selectivity loss (it saturates and
    // admits more rows; the equijoin still verifies), never wrong.
    val estKeys =
      if (expectedKeys > 0) expectedKeys
      else math.max(64L, small.count())
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "leftsemi").contains(jt),
      s"joinType $joinType would need unmatched big-side rows — the " +
        "bloom prefilter already dropped them (use inner or left_semi)")
    bigKeys.zip(smallKeys).foreach { case (b, s) =>
      require(big.schema(b).dataType == small.schema(s).dataType,
        s"key type mismatch $b:${big.schema(b).dataType} vs " +
          s"$s:${small.schema(s).dataType} — xxhash64 is " +
          "type-sensitive, cast to a common type first")
    }
    val bloom = keyBloom(small, smallKeys.map(small(_)), estKeys,
      optimalNumBits(estKeys, fpp))
    val filtered = big.filter(mightContain(bloom, bigKeys.map(big(_))))
    val cond = bigKeys.zip(smallKeys)
      .map { case (b, s) => filtered(b) === small(s) }
      .reduce(_ && _)
    filtered.join(small, cond, joinType)
  }
}
