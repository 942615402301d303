package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics beyond the builtin aggregates. */
object Stats {

  /** Exact linear-interpolated quantiles per key (the percentile_cont
    * definition): for probability p over n sorted values, position
    * pos = p·(n−1) (0-based), result = v⌊pos⌋ + frac·(v⌊pos⌋₊₁ − v⌊pos⌋).
    *
    * Distributed shape: ONE per-key sort (the rank window — at scale
    * this is the documented exact-quantile cost; `approx_percentile`
    * is the sketch path when the sort is unaffordable), then only the
    * 2·|ps| boundary ROWS per key are touched: the target ranks
    * broadcast back (one row per (key, p) — O(keys·ps), tiny) and meet
    * the ranked data on a (key, rank) equijoin, so no second pass ever
    * rescans the values. High-cardinality keys would swap the
    * broadcast for a shuffle join; the plan is otherwise unchanged.
    *
    * Determinism: interpolation is a fixed-order double formula over
    * exactly-selected elements (no sums), identical in any engine;
    * rounded to 6 dp. Output: key, p, q — ordered by nothing (caller
    * sorts).
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0,1]: $ps")
    val w = Window.partitionBy(keyCol).orderBy(valCol)
    val ranked = df.select(col(keyCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCol)))
    val psArr = array(ps.map(lit): _*)
    val targets = ranked.select(col(keyCol), col("__n")).distinct()
      .select(col(keyCol), col("__n"), explode(psArr).as("p"))
      .withColumn("__pos", col("p") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__f", col("__pos") - floor(col("__pos")))
      // the key is RENAMED on this side: both frames descend from
      // `ranked`, so an equality between same-named columns would hit
      // Spark's self-join auto-disambiguation (it logs "trivially true
      // equals predicate" and guesses); the rename makes the join
      // condition unambiguous by construction
      .select(col(keyCol).as("__k"), col("p"), col("__lo"), col("__f"))
    val hits = ranked.join(broadcast(targets),
        col(keyCol) === col("__k") &&
          (col("__rn") === col("__lo") + 1 ||
            col("__rn") === col("__lo") + 2))
      .drop("__k")
      .groupBy(col(keyCol), col("p"), col("__f"))
      .agg(
        max(when(col("__rn") === col("__lo") + 1, col(valCol))).as("__vlo"),
        max(when(col("__rn") === col("__lo") + 2, col(valCol))).as("__vhi"))
    hits.select(col(keyCol), col("p"),
      round(col("__vlo") +
        col("__f") * (coalesce(col("__vhi"), col("__vlo")) - col("__vlo")),
        6).as("q"))
  }
}
