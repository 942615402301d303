package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic document corpus shared by the curation
  * smokes ([[graft.CurateSmoke]], [[graft.CurationStreamSmoke]]) and
  * the bench's streaming-curation block ([[graft.StreamBench]]).
  *
  * Within each 20-doc block, doc 19 is an exact copy of doc 17's text
  * and doc 18 appends one word — so any stream/batch built on it
  * carries 5% exact and 5% near duplicates with rates known at any
  * size. Every 5th token is an English stopword so the quality and
  * language gates pass for the base docs.
  */
object SyntheticDocs {

  /** 30-token deterministic text keyed by `src` (a numeric column). */
  def textFor(src: Column): Column = {
    val stop = array(graft.extra.Text.stopwords("en").map(lit): _*)
    concat_ws(" ", transform(sequence(lit(0), lit(29)), j =>
      when(j % 5 === 0,
        element_at(stop, (pmod(xxhash64(src * 7L + j), lit(8L)) + 1).cast("int")))
        .otherwise(concat(lit("w"),
          pmod(xxhash64(src * 1000003L + j), lit(50000L))))))
  }

  /** Map a monotonically increasing id to the planted-dup text: block
    * position 18 = near dup of position 17, position 19 = exact copy.
    */
  def plantedText(id: Column): Column = {
    val blockBase = id - (id % 20)
    val src = when(id % 20 >= 18, blockBase + 17).otherwise(id)
    when(id % 20 === 18, concat(textFor(src), lit(" extradiffword")))
      .otherwise(textFor(src))
  }

  /** Rate-source stream of JSON doc envelopes (`value` string column:
    * doc_id, text, event_time_ms) at `tps` docs/sec with the planted
    * 5% exact + 5% near duplicates — the wire format
    * [[graft.streaming.CurationStream]] consumes.
    */
  def rateWire(spark: SparkSession, tps: Int): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", tps).load()
    raw.select(to_json(struct(
      col("value").as("doc_id"),
      plantedText(col("value")).as("text"),
      unix_millis(col("timestamp")).as("event_time_ms"))).as("value"))
  }

  /** Deterministic LABELED seed corpus for classifier benches/profiles
    * (one definition so the profiler's numbers describe the same model
    * the streaming_classify block measures): n docs over [[textFor]]'s
    * ~50k-word vocabulary, ids offset clear of any rate source, binary
    * hi/lo labels at a fixed 1:2 ratio.
    */
  def labeledSeed(spark: SparkSession, n: Long = 20000L): DataFrame =
    spark.range(n).select(
      (col("id") + 2000000000L).as("doc_id"),
      textFor(col("id") + 2000000000L).as("text"),
      when(col("id") % 3 === 0, "hi").otherwise("lo").as("label"))

  /** STRUCTURED synthetic doc stream — the same planted-dup corpus as
    * [[rateWire]] without the to_json/from_json round trip: the feed
    * for benches that measure a downstream arm's capacity (e.g. ANN
    * index ingest), where paying the wire-parse again would re-measure
    * what the flagship block already owns.
    */
  def rateDocs(spark: SparkSession, tps: Int): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", tps).load()
    raw.select(col("value").as("doc_id"),
      plantedText(col("value")).as("text"),
      col("timestamp").as("event_time"))
  }
}
