package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Tick

/** Custom keyed streaming state beyond windowed aggregation —
  * `KeyValueGroupedDataset.flatMapGroupsWithState` (the Spark-native
  * form of per-key operator state).
  *
  * [[emaPerSymbol]] maintains an exponential moving average of the price
  * per symbol ACROSS micro-batches — state the windowed aggregates can't
  * express (it never closes). State per key is O(1) (the EMA + count),
  * so the state store stays bounded by key cardinality — the property
  * that matters at 100 TB: state size tracks #symbols, not #ticks.
  */
object Stateful {

  final case class EmaState(ema: Double, nTicks: Long, lastEventMs: Long)
  final case class EmaRow(symbol: String, ema: Double, n_ticks: Long,
      last_event_ms: Long)

  final case class QuoteState(quoteValue: Double, quoteEventMs: Long)
  final case class AsOfEvent(key: String, kind: String, value: Double,
      event_time_ms: Long)
  final case class AsOfRow(key: String, event_time_ms: Long, value: Double,
      asof_value: Option[Double], asof_event_ms: Option[Long])

  /** STREAMING as-of join — the market-native enrichment: a single keyed
    * stream of interleaved reference rows (`kind = "quote"`) and subject
    * rows (`kind = "trade"`); every trade is emitted carrying the
    * latest quote with quote.event_time <= trade.event_time seen so far
    * for its key. State per key is O(1) (the last quote), so the state
    * store tracks key cardinality, not throughput — the batch as-of's
    * union + carry-forward, re-expressed as per-key operator state.
    *
    * Ordering: rows inside a micro-batch are applied in event-time order
    * (arrival-order independent, like [[emaPerSymbol]]); ACROSS batches
    * arrival order is authoritative — a quote arriving in a later batch
    * than a trade it precedes in event time does not retro-fill (use the
    * batch [[graft.extra.TimeSeries.asofJoin]] over the stored stream
    * for late-tolerant finalization; this operator is the low-latency
    * path).
    */
  def asofPerKey(events: Dataset[AsOfEvent]): Dataset[AsOfRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[QuoteState, AsOfRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[AsOfEvent], state: GroupState[QuoteState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.event_time_ms, e.kind, e.value))
          var cur = state.getOption
          val out = Seq.newBuilder[AsOfRow]
          sorted.foreach {
            case q if q.kind == "quote" =>
              // ties ("quote" < "trade" lexicographically) apply the
              // quote first, so an equal-time trade sees it — matching
              // the batch as-of's ties-count-as-matched semantics
              cur = Some(QuoteState(q.value, q.event_time_ms))
            case t =>
              out += AsOfRow(key, t.event_time_ms, t.value,
                cur.map(_.quoteValue), cur.map(_.quoteEventMs))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  final case class SilenceState(lastEventMs: Long, nTicks: Long)
  final case class SilenceAlert(symbol: String, last_event_ms: Long,
      n_ticks: Long)

  /** STREAMING feed-silence detection: alert when a symbol that was
    * ticking goes quiet — the market-data "stale feed" monitor. Uses
    * EVENT-TIME TIMEOUTS: each batch re-arms the key's timeout at
    * (last event time + silenceMs); when the WATERMARK (driven by the
    * other, still-live symbols) passes that mark without new data, the
    * group fires with `hasTimedOut` and emits one alert, then drops its
    * state. Event-time (not processing-time) timeouts keep the operator
    * deterministic and replayable: a backfill reproduces the same
    * alerts. State per key is two longs; a fired key's state is
    * REMOVED, so permanently-dead symbols cost nothing forever after.
    *
    * The input must carry a watermark (the caller's lateness policy);
    * [[withEventTimeWatermark]] attaches one over Tick's epoch-ms field.
    */
  def silenceAlerts(ticks: Dataset[Tick],
      silenceMs: Long): Dataset[SilenceAlert] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[SilenceState, SilenceAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (symbol: String, rows: Iterator[Tick],
            state: GroupState[SilenceState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SilenceAlert(symbol, st.lastEventMs, st.nTicks))
          } else {
            val evs = rows.toSeq
            val prev = state.getOption
            val last = (prev.map(_.lastEventMs).toSeq ++
              evs.map(_.event_time_ms)).max
            state.update(SilenceState(last,
              prev.map(_.nTicks).getOrElse(0L) + evs.size))
            state.setTimeoutTimestamp(last + silenceMs)
            Iterator.empty
          }
      }
  }

  /** Watermark over Tick's epoch-ms event time (helper for the
    * event-time-timeout operators, which require one on the input).
    */
  def withEventTimeWatermark(ticks: Dataset[Tick],
      delay: String): Dataset[Tick] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // the watermark column stays in the frame (dropping it would drop
    // the watermark); the Tick encoder simply ignores extra columns
    ticks.withColumn("__wm", timestamp_millis(col("event_time_ms")))
      .withWatermark("__wm", delay)
      .as[Tick]
  }

  final case class WelfordState(n: Long, mean: Double, m2: Double)
  final case class AnomalyRow(symbol: String, event_time_ms: Long,
      price: Double, zscore: Double, n_seen: Long)

  /** STREAMING anomaly detection: per-symbol online mean/variance
    * (Welford's recurrence — numerically stable, O(1) state) across
    * micro-batches; a tick is emitted when it sits more than `k` sample
    * standard deviations from the mean of all PRIOR ticks for its
    * symbol (the tick then joins the statistics, so a level shift stops
    * alarming once absorbed). No emissions during the first `minObs`
    * ticks per key (warmup). This is the low-latency twin of the batch
    * [[graft.extra.Analytics.anomalyMad]] fences: per-key state is
    * three numbers, so the state store tracks #symbols, not #ticks.
    *
    * Ticks inside a batch are applied in event-time order (arrival-
    * order independent, like [[emaPerSymbol]]).
    */
  def anomaliesPerSymbol(ticks: Dataset[Tick], k: Double = 4.0,
      minObs: Long = 30L): Dataset[AnomalyRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[WelfordState, AnomalyRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[Tick],
            state: GroupState[WelfordState]) =>
          val sorted = rows.toSeq.sortBy(t => (t.event_time_ms, t.price))
          var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = Seq.newBuilder[AnomalyRow]
          sorted.foreach { t =>
            if (st.n >= minObs) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0 && math.abs(t.price - st.mean) > k * sd)
                out += AnomalyRow(symbol, t.event_time_ms, t.price,
                  (t.price - st.mean) / sd, st.n)
            }
            val n1 = st.n + 1
            val d = t.price - st.mean
            val mean1 = st.mean + d / n1
            st = WelfordState(n1, mean1, st.m2 + d * (t.price - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class CusumState(n: Long, mean: Double, m2: Double,
      sp: Double, sn: Double)
  final case class CusumAlarm(symbol: String, event_time_ms: Long,
      price: Double, z: Double, cusum_pos: Double, cusum_neg: Double,
      n_seen: Long)

  /** STREAMING CUSUM — the low-latency twin of
    * [[graft.extra.Indicators.cusum]] (Page's two-sided drift
    * detector) as per-key operator state: Welford moments learn the
    * reference level online (the [[anomaliesPerSymbol]] machinery),
    * each post-warmup observation standardizes against the CURRENT
    * estimate and advances S⁺/S⁻, and a threshold cross emits one
    * alarm row carrying the crossing values.
    *
    * Documented deviations vs the batch twin (inherent to unbounded
    * streams, same contract family as [[cepPerKey]]'s):
    *   - the batch form standardizes against the FULL series moments;
    *     here moments are the running estimate after a `minObs`
    *     warmup (a detector cannot see the future);
    *   - after signaling, BOTH arms reset to 0 (standard online CUSUM
    *     practice) so a sustained shift re-alarms at drift cadence
    *     instead of every observation — the batch form, which reports
    *     the whole trajectory, never resets;
    *   - in-batch event-time order, arrival order across batches.
    *
    * The deviation is PINNED, not just described: StatefulSpec's
    * differential runs both arms over the same 120-day one-obs-per-day
    * series — on stationary data they agree on every day (both
    * silent), and under a planted sustained shift their first alarm
    * days sit within 3 days of each other.
    *
    * State per key is five numbers — O(1) forever. Alarms are the
    * drift complement to [[anomaliesPerSymbol]]'s point outliers: a
    * slow 1σ drift never trips a 4σ point fence but accumulates in
    * S⁺ at ~(1−slack)σ per observation.
    */
  def cusumPerSymbol(ticks: Dataset[Tick], slack: Double = 0.5,
      threshold: Double = 4.0, minObs: Long = 30L): Dataset[CusumAlarm] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[Tick],
            state: GroupState[CusumState]) =>
          val sorted = rows.toSeq.sortBy(t => (t.event_time_ms, t.price))
          var st = state.getOption.getOrElse(
            CusumState(0L, 0.0, 0.0, 0.0, 0.0))
          val out = Seq.newBuilder[CusumAlarm]
          sorted.foreach { t =>
            if (st.n >= minObs) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = (t.price - st.mean) / sd
                var sp = math.max(0.0, st.sp + z - slack)
                var sn = math.max(0.0, st.sn - z - slack)
                if (sp > threshold || sn > threshold) {
                  out += CusumAlarm(symbol, t.event_time_ms, t.price,
                    z, sp, sn, st.n)
                  sp = 0.0
                  sn = 0.0
                }
                st = st.copy(sp = sp, sn = sn)
              }
            }
            val n1 = st.n + 1
            val d = t.price - st.mean
            val mean1 = st.mean + d / n1
            st = st.copy(n = n1, mean = mean1,
              m2 = st.m2 + d * (t.price - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** alpha-weighted EMA; ticks inside a batch are applied in event-time
    * order so results don't depend on arrival order within the batch.
    */
  def emaPerSymbol(ticks: Dataset[Tick], alpha: Double): Dataset[EmaRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[EmaState, EmaRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[Tick], state: GroupState[EmaState]) =>
          val sorted = rows.toSeq.sortBy(t => (t.event_time_ms, t.price))
          if (sorted.isEmpty) Iterator.empty
          else {
            val init = state.getOption.getOrElse(
              EmaState(sorted.head.price, 0L, Long.MinValue))
            val next = sorted.foldLeft(init) { (st, t) =>
              EmaState(
                if (st.nTicks == 0L) t.price
                else alpha * t.price + (1 - alpha) * st.ema,
                st.nTicks + 1,
                math.max(st.lastEventMs, t.event_time_ms))
            }
            state.update(next)
            Iterator.single(
              EmaRow(symbol, next.ema, next.nTicks, next.lastEventMs))
          }
      }
  }

  final case class CepEvent(key: String, event_time_ms: Long, tie: Long,
      event_type: String)
  final case class CepState(step: Int, startMs: Long, skipped: Int)
  final case class CepMatch(key: String, start_ms: Long, end_ms: Long,
      duration_ms: Long, n_skipped: Int)

  /** STREAMING CEP — the skip-till-next-match automaton of
    * [[graft.extra.Cep.matchSkipTillNext]] as per-key operator state
    * (CEP is classically a streaming concern; this is its low-latency
    * half): state per key is the CURRENT partial match only —
    * (step, start, skipped), O(pattern) bounded — advanced event by
    * event; a completed match emits in the batch that closes it.
    *
    * Semantics vs the batch operator (documented deviations, both
    * inherent to bounded-state streaming):
    *   - in-batch event-time order, arrival order across batches
    *     (the [[emaPerSymbol]]/[[asofPerKey]] contract);
    *   - a partial match whose window expires is abandoned and the scan
    *     resumes at the CURRENT event — the batch form rescans from
    *     just after the failed start, which requires the event buffer a
    *     stream cannot keep. On streams where a viable start never
    *     hides behind an expiring one (e.g. the window comfortably
    *     exceeds pattern spans) the two disciplines emit identical
    *     matches — spec-asserted on such a fixture.
    */
  def cepPerKey(events: Dataset[CepEvent], pattern: Seq[String],
      withinMs: Long): Dataset[CepMatch] = {
    require(pattern.size >= 2, s"pattern needs >= 2 steps, got $pattern")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[CepEvent], state: GroupState[CepState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.event_time_ms, e.tie))
          var cur = state.getOption
          val out = Seq.newBuilder[CepMatch]
          sorted.foreach { e =>
            // expire the partial match BEFORE consuming the event, so
            // the event can immediately open a fresh match
            if (cur.exists(c => e.event_time_ms - c.startMs > withinMs))
              cur = None
            cur match {
              case Some(c) if e.event_type == pattern(c.step) =>
                if (c.step + 1 == pattern.size) {
                  out += CepMatch(key, c.startMs, e.event_time_ms,
                    e.event_time_ms - c.startMs, c.skipped)
                  cur = None
                } else cur = Some(c.copy(step = c.step + 1))
              case Some(c) =>
                cur = Some(c.copy(skipped = c.skipped + 1))
              case None if e.event_type == pattern.head =>
                cur = Some(CepState(1, e.event_time_ms, 0))
              case None => ()
            }
          }
          cur match {
            case Some(c) => state.update(c)
            case None if state.exists => state.remove()
            case None => ()
          }
          out.result().iterator
      }
  }
}
