package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}

import graft.model.Schemas

/** Tick-message ingestion: raw transport bytes → typed tick rows with an
  * event-time column. Port of the reference's `parse_kafka`
  * (src/consumer/spark_streaming.py:57-70):
  *   value.cast(string) → from_json(schema) → flatten → event_time.
  *
  * Plus the malformed-record policy the reference lacks (SURVEY.md §1.3):
  * `from_json` yields null structs on bad input; the reference silently
  * passes those nulls downstream. [[parseRaw]] exposes `dropMalformed`.
  */
object TickParse {

  /** `value` (binary or string JSON) → columns (symbol, price,
    * event_time_ms, event_time). Works identically on batch and
    * streaming frames.
    */
  def parseRaw(raw: DataFrame, valueCol: String = "value",
      dropMalformed: Boolean = true): DataFrame = {
    // explode(array(_)) is a 1:1 Generate barrier that forces ONE
    // from_json evaluation per row. Without it, predicate pushdown
    // inlines the parse into every null-check and OptimizeJsonExprs
    // prunes each field access to a distinct schema — distinct
    // expressions defeat codegen subexpression elimination, so the
    // naive form parses the JSON ~5x per row (measured: parse_ticks
    // 2.0s -> this form evaluates the parser once).
    val parsed = raw.select(explode(array(
      from_json(col(valueCol).cast(StringType), Schemas.tick))).as("r"))
    val kept =
      if (dropMalformed) parsed.filter(col("r").isNotNull &&
        col("r.symbol").isNotNull && col("r.price").isNotNull &&
        col("r.event_time_ms").isNotNull)
      else parsed
    withEventTime(kept.select(col("r.*")))
  }

  /** Epoch-millis → timestamp. The reference does
    * `(event_time_ms/1000.0).cast(timestamp)` (spark_streaming.py:68);
    * `timestamp_millis` is the exact-integer-math equivalent
    * (SURVEY.md §2.2 P3).
    */
  def withEventTime(df: DataFrame, msCol: String = "event_time_ms",
      out: String = "event_time"): DataFrame =
    df.withColumn(out, timestamp_millis(col(msCol)))

  /** Inverse: tick columns → JSON payload string, the producer's wire
    * format (src/producer/synthetic_ticks.py:66-71). Used by tests to
    * round-trip and by the backfill path.
    */
  def toJsonPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("symbol"), col("price"),
      col("event_time_ms"))).as("value"))

  /** Symbol normalization used across the reference
    * (synthetic_ticks.py:86, publish_historical.py:47): trim + uppercase.
    */
  def normalizeSymbol(df: DataFrame, c: String = "symbol"): DataFrame =
    df.withColumn(c, upper(trim(col(c))))

  /** CSV backfill read (src/backfill/publish_historical.py:30-56):
    * schema-enforced, header, preserves original event_time_ms.
    */
  def readBackfillCsv(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    withEventTime(
      spark.read.schema(Schemas.tickCsv).option("header", "true").csv(path))

  /** ORC backfill read — the same schema-enforced normalize chain as
    * [[readBackfillCsv]] over a columnar archive (ORC ships in Spark's
    * core jars; a warehouse that lands history as ORC/parquet backfills
    * through the identical path, predicate pushdown and column pruning
    * included). Schema enforced at read, not inferred.
    */
  def readBackfillOrc(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    withEventTime(
      spark.read.schema(Schemas.tickCsv).orc(path))
}
