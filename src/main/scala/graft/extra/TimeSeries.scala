package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators beyond plain windows: as-of joins,
  * sessionization, OHLC resampling (SURVEY.md §2.6 X7/X8).
  *
  * Scale design: every operator here is a single shuffle keyed by the
  * series key, followed by a per-partition time sort — the classic
  * sort-based formulation that scales linearly and spills gracefully.
  * The as-of join deliberately avoids the naive range-join + argmax
  * (quadratic per key) in favor of union + last-non-null carry-forward
  * (one sort, streaming pass).
  */
object TimeSeries {

  /** As-of join: for each left row, attach the nearest right row with
    * the same key — `backward` (the default): most recent right with
    * right.ts <= left.ts; `forward`: earliest right with right.ts >=
    * left.ts. Optional `toleranceSeconds` nulls the carried values when
    * the matched right row is further than the tolerance from the left
    * timestamp (pandas merge_asof semantics). Implemented as a tagged
    * union + last-non-null window carry-forward: O(n log n) per key,
    * one shuffle — the plan a dedicated as-of SparkStrategy would also
    * produce.
    *
    * Ties (right.ts == left.ts) count as matched in BOTH directions: the
    * union orders the right tag ahead of the left tag at equal
    * timestamps. Right rows with a null timestamp are dropped (a
    * timeless observation is never "nearest"); left rows with a null
    * timestamp carry nulls.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      carryCols: Seq[String], direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // the matched right timestamp rides along as a synthetic carry so the
    // tolerance can be applied after the carry-forward
    val withRts = toleranceSeconds.isDefined
    val allCarries = carryCols ++ (if (withRts) Seq("__rts") else Nil)
    def rtsType = right.schema(tsCol).dataType
    val l = left.withColumn("__tag", lit(1))
      .select(Seq(col(key), col(tsCol), col("__tag")) ++
        left.columns.filterNot(c => c == key || c == tsCol).map(col) ++
        carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__c_$c")) ++
        (if (withRts) Seq(lit(null).cast(rtsType).as("__c___rts")) else Nil): _*)
    val r = right.filter(col(tsCol).isNotNull).withColumn("__tag", lit(0))
      .select(Seq(col(key), col(tsCol), col("__tag")) ++
        left.columns.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(c).as(s"__c_$c")) ++
        (if (withRts) Seq(col(tsCol).as("__c___rts")) else Nil): _*)
    // backward: ascending time (nulls first → null-ts left rows see no
    // carries); forward: descending time with the same null guard
    val ord =
      if (direction == "backward") Seq(col(tsCol).asc, col("__tag"))
      else Seq(col(tsCol).desc_nulls_first, col("__tag"))
    val w = Window.partitionBy(col(key))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = allCarries.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__c_$c"), ignoreNulls = true).over(w))
    }
    val base = carried.filter(col("__tag") === 1)
      .drop("__tag")
      .drop(allCarries.map(c => s"__c_$c"): _*)
    toleranceSeconds match {
      case None => base
      case Some(tol) =>
        val diff =
          if (direction == "backward")
            col(tsCol).cast("double") - col("asof___rts").cast("double")
          else col("asof___rts").cast("double") - col(tsCol).cast("double")
        val within = diff <= tol.toDouble
        carryCols.foldLeft(base)((df, c) =>
          df.withColumn(s"asof_$c", when(within, col(s"asof_$c"))))
          .drop("asof___rts")
    }
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds`. Returns input
    * rows + session_id (per-key ordinal).
    */
  def sessionize(df: DataFrame, key: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__gap",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w)))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(wRun))
      .drop("__gap", "__new")
  }

  /** Session summary: one row per (key, session). */
  def sessionStats(df: DataFrame, key: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    sessionize(df, key, tsCol, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_s"))

  /** OHLC resample: open/high/low/close bars per key per time bucket —
    * the market-data classic, expressed with arg_min/arg_max aggregates
    * (deterministic, single shuffle).
    */
  def ohlc(df: DataFrame, key: String, tsCol: String, valCol: String,
      bucket: String): DataFrame = {
    val v = col(valCol)
    val t = col(tsCol)
    df.groupBy(window(t, bucket).as("w"), col(key))
      .agg(
        min_by(v, t).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, t).as("close"),
        count(v).as("volume"))
      .select(col(key), col("w.start").as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }
}
