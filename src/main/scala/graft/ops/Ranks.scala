package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — `row_number()`/`ntile()` OVER a total
  * order WITHOUT the single-partition window.
  *
  * An empty `Window.orderBy(...)` (no PARTITION BY) forces every row
  * through one task — WindowExec even logs "No Partition Defined ...
  * serious performance degradation". That is the one plan shape that can
  * never survive a 100 TB scale-up, so global ranks are computed here as
  * a range-shuffle + per-partition prefix offsets instead:
  *
  *   1. `repartitionByRange(sortCols)` + `sortWithinPartitions` — the
  *      same distributed sort a global ORDER BY compiles to; every
  *      partition holds a contiguous, internally-sorted key range.
  *   2. one tiny job counts rows per partition (O(numPartitions) bytes
  *      to the driver — the same trick as RDD.zipWithIndex; NOT a data
  *      collect);
  *   3. a second pass adds `partitionOffset + localIndex`. Both jobs
  *      share one RDD lineage, so the range shuffle is executed once and
  *      the second job reads the existing shuffle files (skipped stage).
  *
  * Ties: ranks are assigned by the physical total order, so rows equal
  * on ALL `sortCols` may receive either rank — exactly the
  * nondeterminism `row_number()` itself has. Pass a tie-breaking key
  * (e.g. the primary key) for reproducible output.
  */
object Ranks {

  /** Appends a 1-based global row number in `sortCols` order as `out`.
    * Returns the ranked frame plus the total row count (free — the
    * per-partition counts are already on the driver).
    *
    * Lineage caveat (the classic zipWithIndex one): the count job and the
    * rank job both read the SAME materialized range-shuffle output; if
    * shuffle files are lost to executor failure AND the upstream plan is
    * nondeterministic (e.g. an unseeded sample), the recomputed second
    * pass can disagree with the collected counts, duplicating or
    * skipping ranks. Checkpoint or persist a nondeterministic input
    * before calling; deterministic inputs (scans, filters, joins,
    * deterministic exprs) recompute identically and are safe.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd // one lineage: the shuffle below is built once
    val counts = rdd
      .mapPartitions({ it =>
        // count with a Long accumulator — Iterator.size returns Int and
        // silently overflows past 2^31 rows/partition, plausible at
        // 100 TB with a small shuffle-partition count
        var c = 0L
        while (it.hasNext) { it.next(); c += 1L }
        Iterator.single(c)
      }, preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(1L)(_ + _) // 1-based first rank per partition
    val schema = df.schema.add(out, LongType, nullable = false)
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets(pid)
      it.map { row => val o = Row.fromSeq(row.toSeq :+ r); r += 1; o }
    }
    (spark.createDataFrame(ranked, schema), counts.sum)
  }

  /** Appends `ntile(buckets)` over the global `sortCols` order as `out`
    * (IntegerType, buckets numbered from 1). Exact SQL ntile semantics:
    * bucket sizes differ by at most one, with the first `n % buckets`
    * buckets one row larger.
    */
  def withNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      buckets: Int,
      out: String): DataFrame = {
    require(buckets > 0, s"ntile buckets must be positive, got $buckets")
    val rankCol = "__graft_global_rank"
    val (ranked, n) = withGlobalRowNumber(df, sortCols, rankCol)
    val base = n / buckets  // small buckets hold this many rows
    val rem = n % buckets   // this many leading buckets hold base+1
    val cut = rem * (base + 1) // ranks <= cut fall in the larger buckets
    val tile =
      if (base == 0) col(rankCol) // fewer rows than buckets: rank IS the tile
      else expr( // DIV: exact integer division (Column./ is fractional)
        s"""CASE WHEN $rankCol <= $cut
           |     THEN ($rankCol - 1) DIV ${base + 1}
           |     ELSE $rem + ($rankCol - 1 - $cut) DIV $base
           |END + 1""".stripMargin)
    ranked.withColumn(out, tile.cast("int")).drop(rankCol)
  }

  /** Appends `row_number() OVER (PARTITION BY groupCols ORDER BY
    * sortCols)` as `out` (LongType, 1-based) — and the group's total
    * row count as `totalOut` when given — WITHOUT the
    * one-task-per-group window. `Window.partitionBy(group)` routes
    * every row of a group through ONE task; for a grouping like
    * language or domain over a web corpus (~half of 100 TB is one
    * language; the largest domain is millions of pages) that is the
    * same never-survives plan as the empty-partition window, just
    * hidden behind a key. Here the rows range-shuffle on
    * (groupCols ++ sortCols) — every group is a CONTIGUOUS,
    * internally sorted run of partitions, so a partition holds at most
    * one run per group — then:
    *
    *   1. pass 1 collects each partition's ordered (group, runLength)
    *      list: O(P + G) entries to the driver (groups are
    *      contiguous), NOT a data collect;
    *   2. the driver scans partitions in order, accumulating each
    *      group's start offset per partition and its global total;
    *   3. pass 2 re-reads the SAME shuffle output (skipped stage) and
    *      assigns rank = groupStart(pid, group) + localIndex.
    *
    * The group-total column makes per-group NTILE ([[withGroupedNtile]])
    * and per-group quantile selection pure column arithmetic — no
    * second window, no `count() OVER (PARTITION BY group)`. Same tie
    * and lineage caveats as [[withGlobalRowNumber]] (pass a unique
    * tie-break key in `sortCols` for reproducible output). Group
    * columns are referenced by NAME (they key the driver maps); null
    * group values form their own group, like SQL PARTITION BY.
    *
    * REGIME: driver state and pass-2 closures are O(G) in group
    * cardinality, so the two-pass form is for FEW, potentially HUGE
    * groups (languages, event types, sources) — the skew the window
    * cannot survive. MANY small groups are the window's GOOD case
    * (each partition is a task), so past `maxGroups` distinct groups
    * this falls back to the per-group window — same values,
    * spec-pinned. The regime check rides PASS 1 ITSELF (r17 — the
    * separate map-side HLL pre-check job cost one full input pass per
    * call): each partition reports its run count, with the shipped
    * run payload capped (count always exact), and the driver falls
    * back when the total run count can only mean > maxGroups groups
    * or any partition overflowed its payload cap. Driver memory stays
    * linear: ≤ cap·P entries, cap ≈ 8·maxGroups/P (min 1024, never
    * above maxGroups+1). The trade vs the old pre-check: the rare
    * many-groups fallback now pays one wasted range shuffle (the old
    * sketch pass was shuffle-free), while every few-groups call —
    * the regime these operators exist for — saves a whole input
    * pass. An overflowed partition (> cap runs) means > cap distinct
    * groups inside one row-balanced range — necessarily SMALL groups,
    * which is the window's good case, so a cap-induced fallback is
    * safe as well as correct. A web-domain grouping (10⁷⁺ groups,
    * heavy-tailed) crosses regimes: the fallback keeps the driver
    * safe, and the residual risk is the window's biggest-group task,
    * exactly what it was before.
    *
    * Keys are normalized for value equality where the JVM diverges
    * from SQL grouping: byte arrays compare element-wise, ±0.0
    * collapse — so a BinaryType or floating group column groups like
    * SQL PARTITION BY instead of by object identity.
    *
    * EAGER: runs jobs at CALL time (the HLL pre-check, pass 1, and the
    * upstream plan they execute) — not at first action like a lazy
    * transform. Call it where the frame is about to be consumed;
    * composing it into a plan that is merely explained/analyzed pays
    * the jobs anyway.
    */
  /** Per-partition payload cap for the fused pass-1 regime check: big
    * enough that the few-groups regime never false-falls-back under
    * moderate skew (min 1024; ~8× the even-spread share per
    * partition), never above maxGroups + 1 (past that the partition
    * alone proves the fallback), so the driver collect stays ≤ cap·P
    * entries in every regime.
    */
  private def runPayloadCap(maxGroups: Long, parts: Int): Long =
    math.min(maxGroups + 1L, math.max(1024L, 8L * (maxGroups / parts + 1L)))

  /** Pass 1 with the regime check fused in: per partition, the exact
    * run count plus the ordered (group key, run aggregate) list —
    * payload dropped (null) past `cap` runs. `None` when the observed
    * runs can only mean > maxGroups groups (total runs exceed
    * maxGroups + P − 1; contiguous groups split across at most P − 1
    * boundaries) or any partition overflowed its payload cap.
    */
  private def collectRuns(
      rdd: org.apache.spark.rdd.RDD[Row],
      keyOf: Row => Seq[Any],
      valueOf: Row => Long,
      maxGroups: Long,
      parts: Int): Option[Array[Array[(Seq[Any], Long)]]] = {
    val cap = runPayloadCap(maxGroups, parts)
    val perPart: Array[(Long, Array[(Seq[Any], Long)])] = rdd
      .mapPartitions({ it =>
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Seq[Any], Long)]
        var cur: Seq[Any] = null
        var acc = 0L
        var nRuns = 0L
        var any = false
        def close(): Unit = {
          nRuns += 1L
          if (nRuns <= cap) buf += ((cur, acc)): Unit
        }
        while (it.hasNext) {
          val row = it.next()
          val k = keyOf(row)
          if (!any || k != cur) {
            if (any) close()
            cur = k; acc = 0L; any = true
          }
          acc += valueOf(row)
        }
        if (any) close()
        Iterator.single((nRuns, if (nRuns <= cap) buf.toArray else null))
      }, preservesPartitioning = true)
      .collect()
    val totalRuns = perPart.iterator.map(_._1).sum
    if (totalRuns > maxGroups + parts - 1L ||
        perPart.exists(_._2 == null)) None
    else Some(perPart.map(_._2))
  }

  def withGroupedRowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      out: String,
      totalOut: Option[String] = None,
      maxGroups: Long = 100000L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty — use " +
      "withGlobalRowNumber for the global order")
    require(maxGroups >= 1, s"maxGroups must be >= 1, got $maxGroups")
    val spark = df.sparkSession
    def windowFallback(): DataFrame = {
      // many-groups regime: the per-group window parallelizes on the
      // group key itself; O(G) driver maps would be the hazard here
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*)
      val ranked = df.withColumn(out, row_number().over(w).cast("long"))
      totalOut.fold(ranked)(t => ranked.withColumn(t,
        count(lit(1L)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*))))
    }
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val keyCols = groupCols.map(col) ++ sortCols
    val sorted = df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    // SQL-grouping key normalization: Array[Byte] has identity equals
    // (every row would start a new run, then pass 2's map lookup with a
    // fresh instance throws); boxed -0.0 != 0.0 while SQL collapses them
    def keyOf(row: Row): Seq[Any] = gIdx.map(row.get(_) match {
      case b: Array[Byte] =>
        scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
      case d: java.lang.Double if d.doubleValue() == 0.0 => 0.0d
      case f: java.lang.Float if f.floatValue() == 0.0f => 0.0f
      case x => x
    })
    val rdd = sorted.rdd // one lineage: the range shuffle is built once
    // pass 1 (regime check fused in — see the class doc): ordered
    // (group key, run length) per partition — a sorted partition holds
    // ONE contiguous run per group it sees
    val runs = collectRuns(rdd, keyOf, _ => 1L, maxGroups, parts) match {
      case None => return windowFallback()
      case Some(rs) => rs
    }
    // driver scan: per-(partition, group) start rank + per-group totals
    val sofar = scala.collection.mutable.Map.empty[Seq[Any], Long]
    val starts = scala.collection.mutable.Map.empty[(Int, Seq[Any]), Long]
    runs.zipWithIndex.foreach { case (rs, pid) =>
      rs.foreach { case (k, c) =>
        val prev = sofar.getOrElse(k, 0L)
        starts((pid, k)) = prev + 1L
        sofar(k) = prev + c
      }
    }
    val totals = sofar.toMap
    val startsM = starts.toMap
    val emitTotal = totalOut.isDefined
    val schema0 = sorted.schema.add(out, LongType, nullable = false)
    val schema = totalOut.fold(schema0)(
      schema0.add(_, LongType, nullable = false))
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var any = false
      var rank = 0L
      var n = 0L
      it.map { row =>
        val k = keyOf(row)
        if (!any || k != cur) {
          cur = k; any = true
          rank = startsM((pid, k))
          n = totals(k)
        } else rank += 1L
        if (emitTotal) Row.fromSeq(row.toSeq :+ rank :+ n)
        else Row.fromSeq(row.toSeq :+ rank)
      }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Appends `ntile(buckets) OVER (PARTITION BY groupCols ORDER BY
    * sortCols)` as `out` (IntegerType, 1-based) without the
    * one-task-per-group window: [[withGroupedRowNumber]] for the
    * per-group (rank, total), then [[withNtile]]'s exact bucket
    * arithmetic as a pure projection — bucket sizes differ by at most
    * one per group, the first n % buckets buckets one row larger.
    */
  def withGroupedNtile(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      buckets: Int,
      out: String,
      maxGroups: Long = 100000L): DataFrame = {
    require(buckets > 0, s"ntile buckets must be positive, got $buckets")
    val rankCol = "__graft_group_rank"
    val totCol = "__graft_group_total"
    val ranked = withGroupedRowNumber(df, groupCols, sortCols, rankCol,
      Some(totCol), maxGroups)
    val tile = expr( // DIV: exact integer division (Column./ is fractional)
      s"""CASE WHEN $totCol < $buckets THEN $rankCol
         |     WHEN $rankCol <= ($totCol % $buckets)
         |                      * ($totCol DIV $buckets + 1)
         |     THEN ($rankCol - 1) DIV ($totCol DIV $buckets + 1) + 1
         |     ELSE $totCol % $buckets
         |          + ($rankCol - 1 - ($totCol % $buckets)
         |                           * ($totCol DIV $buckets + 1))
         |            DIV ($totCol DIV $buckets) + 1
         |END""".stripMargin)
    ranked.withColumn(out, tile.cast("int"))
      .drop(rankCol, totCol)
  }

  /** Appends the INCLUSIVE running sum of `valueOf` over the global
    * `sortCols` order as `out` — `SUM(v) OVER (ORDER BY …)` without the
    * single-partition window, by the same two-pass range-shuffle trick
    * as [[withGlobalRowNumber]]: per-partition value sums (O(P) longs to
    * the driver) become partition prefix offsets, then a second pass
    * over the SAME shuffle output accumulates locally on top of each
    * offset. The driving use is token-budget corpus selection: order by
    * quality, cut where the running token total crosses the budget —
    * at 100 TB the one-task global window this replaces is the plan
    * shape that can never survive.
    *
    * `valueOf` is evaluated per row AFTER the range shuffle (it must be
    * a deterministic function of the row). Same tie/lineage caveats as
    * [[withGlobalRowNumber]].
    */
  def withGlobalPrefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueOf: Column,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val valCol = "__graft_prefix_val"
    val sorted = df.withColumn(valCol, valueOf.cast("long"))
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val valIdx = sorted.schema.fieldIndex(valCol)
    val rdd = sorted.rdd // one lineage: the range shuffle is built once
    val partSums = rdd
      .mapPartitions({ it =>
        var s = 0L
        while (it.hasNext) {
          val row = it.next()
          // fail with the contract, not an executor NPE: a null here is
          // a caller bug (nullable valueOf), and getLong on a null slot
          // dies as an opaque NullPointerException deep in the task
          if (row.isNullAt(valIdx)) throw new IllegalArgumentException(
            "withGlobalPrefixSum: valueOf evaluated to NULL — the value " +
              "expression must be non-null integral for every row " +
              "(filter nulls or coalesce before calling)")
          s += row.getLong(valIdx)
        }
        Iterator.single(s)
      }, preservesPartitioning = true)
      .collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        acc += row.getLong(valIdx)
        Row.fromSeq(row.toSeq :+ acc)
      }
    }
    spark.createDataFrame(summed, schema).drop(valCol)
  }

  /** Appends the INCLUSIVE running sum of `valueOf` over
    * `PARTITION BY groupCols ORDER BY sortCols` as `out` (LongType) —
    * the per-GROUP token-budget primitive ("keep each domain's
    * best docs until ITS budget is hit", the per-source cap a
    * pre-training mixture applies after global selection) — without
    * the one-task-per-group window. Same two-pass range-shuffle trick
    * as [[withGroupedRowNumber]] (pass 1 collects per-partition
    * (group, runSum) lists, O(P + G) to the driver; pass 2 accumulates
    * on per-(partition, group) offsets over the SAME shuffle files),
    * with [[withGroupedRowNumber]]'s regimes: past `maxGroups`
    * distinct groups (map-side HLL pre-check) it falls back to the
    * per-group window — many small groups are the window's good case.
    * Group keys are normalized the same way (byte arrays element-wise,
    * ±0.0 collapse). EAGER at call time, same tie/lineage caveats and
    * the same non-null `valueOf` contract as [[withGlobalPrefixSum]]
    * — enforced in BOTH regimes (the window fallback would otherwise
    * silently SKIP null values where the two-pass form fails loudly).
    */
  def withGroupedPrefixSum(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      valueOf: Column,
      out: String,
      maxGroups: Long = 100000L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty — use " +
      "withGlobalPrefixSum for the global order")
    require(maxGroups >= 1, s"maxGroups must be >= 1, got $maxGroups")
    val spark = df.sparkSession
    val valCol = "__graft_prefix_val"
    // fail-fast null contract shared by both regimes
    val guarded = when(valueOf.isNull, raise_error(lit(
      "withGroupedPrefixSum: valueOf evaluated to NULL — the value " +
        "expression must be non-null integral for every row " +
        "(filter nulls or coalesce before calling)")).cast("long"))
      .otherwise(valueOf.cast("long"))
    def windowFallback(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      df.withColumn(valCol, guarded)
        .withColumn(out, sum(col(valCol)).over(w))
        .drop(valCol)
    }
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val keyCols = groupCols.map(col) ++ sortCols
    val sorted = df.withColumn(valCol, guarded)
      .repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val valIdx = sorted.schema.fieldIndex(valCol)
    def keyOf(row: Row): Seq[Any] = gIdx.map(row.get(_) match {
      case b: Array[Byte] =>
        scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
      case d: java.lang.Double if d.doubleValue() == 0.0 => 0.0d
      case f: java.lang.Float if f.floatValue() == 0.0f => 0.0f
      case x => x
    })
    val rdd = sorted.rdd // one lineage: the range shuffle is built once
    // pass 1 (regime check fused in — see withGroupedRowNumber): the
    // per-run aggregate here is the run's value SUM; the raise_error
    // guard rides the shuffled valCol, so a NULL still fails loudly in
    // this regime too
    val runs = collectRuns(rdd, keyOf, _.getLong(valIdx), maxGroups,
      parts) match {
      case None => return windowFallback()
      case Some(rs) => rs
    }
    val sofar = scala.collection.mutable.Map.empty[Seq[Any], Long]
    val starts = scala.collection.mutable.Map.empty[(Int, Seq[Any]), Long]
    runs.zipWithIndex.foreach { case (rs, pid) =>
      rs.foreach { case (k, s) =>
        val prev = sofar.getOrElse(k, 0L)
        starts((pid, k)) = prev
        sofar(k) = prev + s
      }
    }
    val startsM = starts.toMap
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var any = false
      var acc = 0L
      it.map { row =>
        val k = keyOf(row)
        if (!any || k != cur) {
          cur = k; any = true
          acc = startsM((pid, k))
        }
        acc += row.getLong(valIdx)
        Row.fromSeq(row.toSeq :+ acc)
      }
    }
    spark.createDataFrame(summed, schema).drop(valCol)
  }

  /** Appends the EXCLUSIVE running max of `valueOf` over the global
    * `sortCols` order as `out` — `MAX(v) OVER (ORDER BY … ROWS BETWEEN
    * UNBOUNDED PRECEDING AND 1 PRECEDING)` without the one-task window,
    * by the same two-pass range-shuffle trick as
    * [[withGlobalPrefixSum]] (per-partition maxes → O(P) longs →
    * partition prefix offsets → local accumulate). Exclusive — the row's
    * own value does NOT count, and the global first row gets
    * `Long.MinValue` — because the driving use is dominance tests
    * ("does anything strictly before me beat me": skyline frontiers,
    * record-so-far streams), where including self is exactly the bug.
    */
  def withGlobalPrefixMax(
      df: DataFrame,
      sortCols: Seq[Column],
      valueOf: Column,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val valCol = "__graft_prefix_val"
    val sorted = df.withColumn(valCol, valueOf.cast("long"))
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val valIdx = sorted.schema.fieldIndex(valCol)
    val rdd = sorted.rdd // one lineage: the range shuffle is built once
    val partMaxes = rdd
      .mapPartitions({ it =>
        var m = Long.MinValue
        while (it.hasNext) {
          val row = it.next()
          // same fail-fast contract as withGlobalPrefixSum: a null
          // valueOf (e.g. skyline2d over a group whose maximize column
          // is all NULL) must name the contract, not NPE in a task
          if (row.isNullAt(valIdx)) throw new IllegalArgumentException(
            "withGlobalPrefixMax: valueOf evaluated to NULL — the value " +
              "expression must be non-null integral for every row " +
              "(filter nulls or coalesce before calling)")
          m = math.max(m, row.getLong(valIdx))
        }
        Iterator.single(m)
      }, preservesPartitioning = true)
      .collect()
    val offsets = partMaxes.scanLeft(Long.MinValue)(math.max)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val maxed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        val o = Row.fromSeq(row.toSeq :+ acc)
        acc = math.max(acc, row.getLong(valIdx))
        o
      }
    }
    spark.createDataFrame(maxed, schema).drop(valCol)
  }
}
