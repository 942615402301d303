package graft.extra

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event-processing operators: ordered event-sequence pattern
  * detection per key — the SQL-2016 `MATCH_RECOGNIZE` core, Spark-first
  * (reference point: CEP engines like Flink CEP / HYPERSONIC; the
  * SIGMOD'22 hybrid-parallelization insight — partition by key, keep
  * per-key matching sequential — is exactly Spark's keyed-window /
  * keyed-state execution model, so both operators below parallelize
  * across keys for free).
  *
  * Two match disciplines, two execution tiers:
  *
  *   - [[matchContiguous]] — STRICT contiguity (`PATTERN (A B C)` with
  *     no gaps): pure window functions, one keyed sort, whole-stage
  *     codegen, oracle-able. The right tool when intervening events
  *     invalidate the pattern (tick anomalies, error bursts).
  *   - [[matchSkipTillNext]] — SKIP TILL NEXT MATCH (gaps allowed,
  *     greedy, non-overlapping): inherently sequential per key (each
  *     decision depends on the previous match's extent), so it rides
  *     the documented typed flatMapGroups tier (same justification as
  *     EWMA's fold and Packing's shard fill): events sort once per key,
  *     state is O(pattern length), output deterministic.
  *
  * Scale shape: both operators shuffle ONCE on the key; per-key event
  * counts bound memory (matchSkipTillNext streams the sorted iterator
  * with O(1) live state — nothing is collected). At 100 TB the key
  * space (users, symbols) dwarfs the cluster, so keyed parallelism is
  * the whole story — the HYPERSONIC observation.
  */
object Cep {

  /** Strict-contiguous pattern matches: rows at CONSECUTIVE positions
    * (ordered by `tsCol`, ties by `tieCol` — total per key) whose types
    * equal `pattern`, with the whole match inside `withinMs`. Every
    * position is tested, so overlapping matches all emit — deterministic
    * and engine-reproducible (the oracle replays the same `lead` chain).
    *
    * Output: key, `match_start`, `match_end` (timestamps of the first /
    * last pattern row), `duration_ms` (BIGINT, exact millis diff).
    */
  def matchContiguous(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, pattern: Seq[String], withinMs: Long,
      tieCol: String): DataFrame = {
    require(pattern.size >= 2, s"pattern needs >= 2 steps, got $pattern")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val n = pattern.size
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val typed = df.select(col(keyCol), col(tsCol), col(tieCol),
      col(typeCol).as("__t"))
    val withLeads = typed
      .withColumn("__end_ts", lead(col(tsCol), n - 1).over(w))
      .withColumns(
        (1 until n).map(i => s"__t$i" -> lead(col("__t"), i).over(w)).toMap)
    val stepsMatch = (1 until n)
      .map(i => col(s"__t$i") === pattern(i))
      .foldLeft(col("__t") === pattern.head)(_ && _)
    withLeads
      .where(stepsMatch &&
        col("__end_ts").isNotNull &&
        unix_millis(col("__end_ts")) - unix_millis(col(tsCol)) <= withinMs)
      .select(col(keyCol), col(tsCol).as("match_start"),
        col("__end_ts").as("match_end"),
        (unix_millis(col("__end_ts")) - unix_millis(col(tsCol)))
          .as("duration_ms"))
  }

  /** One emitted match of [[matchSkipTillNext]]. */
  final case class SeqMatch(key: Long, match_start: java.sql.Timestamp,
      match_end: java.sql.Timestamp, duration_ms: Long, n_skipped: Int)

  /** Internal typed event row (public: Catalyst's generated
    * deserializer cannot construct a private class).
    */
  final case class Ev(key: Long, ts: java.sql.Timestamp,
      tie: Long, typ: String)

  /** SKIP-TILL-NEXT-MATCH semantics (the default of most CEP engines):
    * per key, scan events in (ts, tie) order; a match starts at the
    * first `pattern.head`, then each subsequent step binds to the NEXT
    * occurrence of its type (other events are skipped and counted);
    * a completed match must fit in `withinMs`, emits, and the scan
    * resumes at the event AFTER the match end (non-overlapping). A
    * partial match that exceeds `withinMs` is abandoned and the scan
    * resumes at the event after its START (so a late completion cannot
    * shadow an earlier viable start). Greedy + total order ⇒ the match
    * set is unique — deterministic on any partitioning.
    *
    * Typed-tier implementation (see class doc): one groupByKey shuffle,
    * events sorted per key, O(pattern) live state, streaming emit.
    *
    * KEY CONTRACT: `keyCol` must be NUMERIC — it is cast to long for
    * the typed `Ev` row, so a string key becomes NULL under the cast
    * (or throws under ANSI) and dies at deserialization of the
    * non-nullable field. Pre-hash arbitrary keys with
    * `xxhash64(key)` (what StatefulSpec does); the emitted `key` is
    * then that hash — join back on it to recover the original.
    */
  def matchSkipTillNext(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, pattern: Seq[String], withinMs: Long,
      tieCol: String): Dataset[SeqMatch] = {
    require(pattern.size >= 2, s"pattern needs >= 2 steps, got $pattern")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val spark = df.sparkSession
    import spark.implicits._
    implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
    val typed = df.select(
      col(keyCol).cast("long").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(tieCol).cast("long").as("tie"),
      col(typeCol).cast("string").as("typ")).as[Ev]
    typed.groupByKey(_.key).flatMapGroups { (key, it) =>
      // per-key event counts are bounded (sessions/users); the sort is
      // the one place the whole key must be resident — the same
      // contract as Packing's shard fill
      val evs = it.toArray.sortBy(e => (e.ts.getTime, e.tie))
      val out = scala.collection.mutable.ArrayBuffer.empty[SeqMatch]
      var i = 0
      while (i < evs.length) {
        if (evs(i).typ == pattern.head) {
          val startMs = evs(i).ts.getTime
          var step = 1
          var j = i + 1
          var skipped = 0
          var failed = false
          while (step < pattern.size && !failed && j < evs.length) {
            if (evs(j).ts.getTime - startMs > withinMs) failed = true
            else if (evs(j).typ == pattern(step)) { step += 1; j += 1 }
            else { skipped += 1; j += 1 }
          }
          if (step == pattern.size && !failed) {
            val end = evs(j - 1)
            out += SeqMatch(key, evs(i).ts, end.ts,
              end.ts.getTime - startMs, skipped)
            i = j // resume after the match end: non-overlapping
          } else {
            i += 1 // abandoned start: resume right after it
          }
        } else i += 1
      }
      out.iterator
    }
  }
}
