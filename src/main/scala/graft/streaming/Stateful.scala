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
}
