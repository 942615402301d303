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

  /** Skew-safe as-of join: same semantics, arguments, and output columns
    * as [[asofJoin]], but each key's timeline is SPLIT into coarse
    * buckets of `bucketSeconds`, so a single hypertraded key
    * parallelizes across (key, bucket) partitions instead of funneling
    * its whole history through one task ([[asofJoin]] and the native
    * `AsOfJoinExec` both cluster by key alone — the known skew limit).
    *
    * Three phases:
    *   1. boundary rows — per (key, bucket), the right row a bucket
    *      hands across its edge (last for backward, first for forward);
    *   2. bucket-level carry — a per-key window over ONE ROW PER BUCKET
    *      (not per event) computes each left bucket's incoming state;
    *      this is the only per-key serial step, O(span/bucketSeconds);
    *   3. the plain union + carry-forward window, partitioned by
    *      (key, bucket), with the incoming state injected as a synthetic
    *      right row at the bucket edge (ordered before/after every real
    *      row of the bucket by construction).
    *
    * Tie caveat: when several right rows share the boundary timestamp,
    * phase 1's argmax picks one arbitrarily — the same nondeterminism
    * the plain form has at equal timestamps.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, carryCols: Seq[String], direction: String = "backward",
      toleranceSeconds: Option[Long] = None,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val back = direction == "backward"
    def bktOf(c: Column): Column =
      floor(c.cast("double") / bucketSeconds).cast("long")

    val withRts = toleranceSeconds.isDefined
    val allCarries = carryCols ++ (if (withRts) Seq("__rts") else Nil)
    val rtsType = right.schema(tsCol).dataType
    val otherLeftCols = left.columns.filterNot(c => c == key || c == tsCol)

    // phase 1: boundary state per (key, bucket) — carries + true right ts
    val rb = right.filter(col(tsCol).isNotNull)
      .withColumn("__bkt", bktOf(col(tsCol)))
    val pick = struct(
      carryCols.map(c => col(c).as(s"c_$c")) :+ col(tsCol).as("c___ts"): _*)
    val boundary = rb.groupBy(col(key), col("__bkt"))
      .agg((if (back) max_by(pick, col(tsCol))
            else min_by(pick, col(tsCol))).as("__st"))
      .withColumn("__btag", lit(2))

    // phase 2: incoming state per left bucket — window over bucket-level
    // rows; boundary of the SAME bucket sorts after the left-bucket row,
    // so only strictly earlier (backward) / later (forward) buckets feed
    val lBkts = left.filter(col(tsCol).isNotNull)
      .select(col(key), bktOf(col(tsCol)).as("__bkt")).distinct()
      .withColumn("__btag", lit(1))
      .withColumn("__st", lit(null).cast(boundary.schema("__st").dataType))
    val bw = Window.partitionBy(col(key))
      .orderBy(if (back) col("__bkt").asc else col("__bkt").desc,
        col("__btag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val incoming = lBkts.unionByName(
        boundary.select(col(key), col("__bkt"), col("__btag"), col("__st")))
      .withColumn("__in", last(col("__st"), ignoreNulls = true).over(bw))
      .filter(col("__btag") === 1 && col("__in").isNotNull)
      .select(col(key), col("__bkt"), col("__in"))

    // phase 3: plain union + carry-forward, partitioned by (key, bucket),
    // with synthetic right rows at the bucket edge carrying the incoming
    // state (bucket start for backward — sorts before every real row of
    // the bucket; exclusive bucket end for forward)
    val synthTs = ((if (back) col("__bkt") else col("__bkt") + 1) *
      bucketSeconds).cast(left.schema(tsCol).dataType)
    val synth = incoming.select(
      Seq(col(key), synthTs.as(tsCol), lit(-1).as("__tag"), col("__bkt")) ++
        otherLeftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(s"__in.c_$c").as(s"__c_$c")) ++
        (if (withRts) Seq(col("__in.c___ts").as("__c___rts")) else Nil): _*)
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__bkt", bktOf(col(tsCol)))
      .select(Seq(col(key), col(tsCol), col("__tag"), col("__bkt")) ++
        otherLeftCols.map(col) ++
        carryCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__c_$c")) ++
        (if (withRts) Seq(lit(null).cast(rtsType).as("__c___rts")) else Nil): _*)
    val r = rb.withColumn("__tag", lit(0))
      .select(Seq(col(key), col(tsCol), col("__tag"), col("__bkt")) ++
        otherLeftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.map(c => col(c).as(s"__c_$c")) ++
        (if (withRts) Seq(col(tsCol).as("__c___rts")) else Nil): _*)
    val ord =
      if (back) Seq(col(tsCol).asc, col("__tag"))
      else Seq(col(tsCol).desc_nulls_first, col("__tag"))
    val w = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = allCarries.foldLeft(
      l.unionByName(r).unionByName(synth)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__c_$c"), ignoreNulls = true).over(w))
    }
    val base = carried.filter(col("__tag") === 1)
      .drop("__tag", "__bkt")
      .drop(allCarries.map(c => s"__c_$c"): _*)
    toleranceSeconds match {
      case None => base
      case Some(tol) =>
        val diff =
          if (back)
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
  /** Interval (range) join: every (left, right) pair sharing `key`
    * whose timestamps lie within `toleranceSeconds` of each other —
    * the batch twin of the watermarked stream-stream interval join.
    *
    * Scale shape: a naive formulation is a per-key cross join. Here the
    * time axis is bucketed at the tolerance width, the RIGHT side
    * explodes to its bucket ± 1 (three rows), and the join is a pure
    * EQUIJOIN on (key, bucket) + a residual |Δt| filter: any pair
    * within tolerance differs by at most one bucket, and each pair
    * meets on exactly ONE bucket id (the left row's), so no dedup pass
    * is needed. Cost: one shuffle per side (right 3×); worst case is a
    * genuinely dense (key, bucket) — that cost is the OUTPUT size, not
    * a planning artifact.
    *
    * Column contract: caller ensures left/right column names are
    * disjoint apart from `key`. Output: left.* ++ right.* (key once) +
    * `delta_us` (right ts − left ts, microseconds, exact).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsCol: String, rightTsCol: String,
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds > 0,
      s"toleranceSeconds must be positive: $toleranceSeconds")
    val tolUs = toleranceSeconds * 1000000L
    // integer bucket id (epoch µs are non-negative, so truncating DIV
    // is floor); exact long arithmetic — no double rounding at bucket
    // boundaries
    val l = left.withColumn("__lus", unix_micros(col(leftTsCol)))
      .withColumn("__bkt", expr(s"__lus DIV $tolUs"))
    val r0 = right.withColumn("__rus", unix_micros(col(rightTsCol)))
    val rb = expr(s"__rus DIV $tolUs")
    val r = r0.withColumn("__bkt", explode(array(rb - 1, rb, rb + 1)))
    val rightCols = right.columns.filterNot(_ == key)
    l.join(r, Seq(key, "__bkt"))
      .filter(abs(col("__rus") - col("__lus")) <= tolUs)
      .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        left.columns.map(col) ++ rightCols.map(col) :+
          (col("__rus") - col("__lus")).as("delta_us")): _*)
  }

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
