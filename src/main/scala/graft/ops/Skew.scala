package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE (`spark.sql.adaptive.skewJoin`) re-splits skewed partitions at
  * runtime; these helpers are the explicit, planner-independent forms
  * for when a key's fan-in exceeds a single executor even after AQE —
  * the "one symbol is 40% of the tape" problem in market data, or a
  * boilerplate shingle in dedup.
  */
object Skew {

  /** Deterministic pseudo-random salt in [0, buckets). Keyed on a full
    * row hash so it needs no RNG state and replays identically.
    */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase (salted) count aggregation: groupBy(keys + salt) partial,
    * then groupBy(keys) final sum. Identical result to a direct
    * groupBy(keys).count(), but the first shuffle spreads each hot key
    * over `buckets` reducers.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", salt(buckets, saltSource))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))

  /** Salted broadcast-style join for a skewed left side: the right side
    * is replicated `buckets` times with an explicit salt column, the
    * left side gets a deterministic salt, and the join key becomes
    * (key, salt) — each hot key now lands on `buckets` reducers.
    * Results are identical to `left.join(right, keys)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int, leftSaltSource: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(buckets, leftSaltSource))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }
}
