package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.extra.Curation

/** Ingest-time curation — the stream-safe subset of
  * [[graft.extra.Curation.curate]] applied at the door instead of after
  * storage:
  *
  *   - quality + language gates: pure projections, run per micro-batch;
  *   - exact dedup: `dropDuplicatesWithinWatermark` on the content hash —
  *     state holds one hash per unique doc inside the watermark horizon,
  *     so a replayed/duplicated document is dropped while its first copy
  *     is in flight.
  *
  * Near-dup removal and split assignment stay BATCH concerns (they need
  * corpus-global candidate joins); the point of the streaming stage is
  * cutting junk and copies before they ever hit storage, shrinking the
  * nightly batch curation's input.
  */
object CurationStream {

  /** Wire schema: JSON lines `{doc_id, text, event_time_ms}`. */
  val wireSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("event_time_ms", LongType)))

  /** Raw `value`-column stream → curated (doc_id, text, event_time)
    * stream: parsed, gated, exact-deduped within the watermark.
    */
  def curateStream(raw: DataFrame, cfg: Curation.Config = Curation.Config(),
      watermark: String = "10 minutes"): DataFrame = {
    val parsed = raw
      .select(from_json(col("value"), wireSchema).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        timestamp_millis(col("d.event_time_ms")).as("event_time"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    Curation.enrich(parsed, "text")
      .filter(!Curation.lowQualityFlag(cfg) && !Curation.wrongLangFlag(cfg))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .select("doc_id", "text", "event_time")
  }
}
