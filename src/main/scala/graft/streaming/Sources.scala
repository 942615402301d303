package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Streaming tick sources behind one trait, mirroring the reference's
  * Kafka reader options (spark_streaming.py:315-322) so a real Kafka
  * implementation is a drop-in. No Kafka connector jar ships in this
  * environment (SURVEY.md §2.1 S1), so the concrete impls are
  * MemoryStream (tests), file source (backfill replays), and the rate
  * source (sustained-throughput benches).
  *
  * Every source yields a raw frame with a single string `value` column —
  * the JSON wire format — which [[graft.ops.TickParse.parseRaw]] turns
  * into typed ticks, exactly like the reference's parse_kafka.
  */
final case class SourceOptions(
    /** earliest | latest — honored by sources that can seek. */
    startingOffsets: String = "earliest",
    /** tolerate missing data instead of failing (Kafka parity). */
    failOnDataLoss: Boolean = false,
    /** micro-batch size cap (Kafka's maxOffsetsPerTrigger analogue). */
    maxFilesPerTrigger: Int = 1)

trait TickSource {
  def stream(spark: SparkSession): DataFrame
}

/** In-memory source for tests: push JSON payload strings, including
  * out-of-order and late batches, exactly like a topic replay.
  */
final class MemoryTickSource(spark: SparkSession) extends TickSource {
  import spark.implicits._
  implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  val inner: MemoryStream[String] = MemoryStream[String]
  def addData(payloads: Seq[String]): Unit = { inner.addData(payloads); () }
  override def stream(s: SparkSession): DataFrame =
    inner.toDF().select(col("value"))
}

/** File-drop source: any JSON-lines files appearing under `dir` become
  * micro-batches — the no-Kafka stand-in for topic backfill
  * (publish_historical.py semantics: event_time_ms preserved in payload).
  *
  * Option mapping onto the file source's knobs:
  *   - `maxFilesPerTrigger` → same-named option (micro-batch size cap);
  *   - `startingOffsets=latest` → `latestFirst=true` (drain newest files
  *     first — the closest file-source analogue to seeking to the tail).
  *     SEMANTIC DIFFERENCE: unlike Kafka's `latest`, which SKIPS
  *     pre-existing records, the file source still processes the entire
  *     backlog — `latestFirst` only reorders it. Downstream dedup /
  *     watermark logic must tolerate the historical replay (old event
  *     times arriving late in processing time); callers wanting true
  *     tail-seek should point the source at an empty directory or prune
  *     processed files externally;
  *   - `failOnDataLoss=false` → `ignoreMissingFiles=true` (files deleted
  *     between listing and read don't kill the query).
  */
final class FileTickSource(dir: String,
    opts: SourceOptions = SourceOptions()) extends TickSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", opts.maxFilesPerTrigger)
      .option("latestFirst", opts.startingOffsets.trim.toLowerCase == "latest")
      .option("ignoreMissingFiles", !opts.failOnDataLoss)
      .json(dir)
}

/** Kafka source — the compile-ready drop-in for the reference's reader
  * (spark_streaming.py:315-322). The reference's reader options map
  * verbatim:
  *   - `subscribe` → the topic;
  *   - `startingOffsets` → earliest | latest, Kafka-native semantics
  *     (latest genuinely skips the backlog, unlike [[FileTickSource]]);
  *   - `failOnDataLoss` → same-named option;
  *   - `maxOffsetsPerTrigger` → the micro-batch size cap
  *     ([[SourceOptions.maxFilesPerTrigger]]'s Kafka analogue).
  *
  * The spark-sql-kafka connector jar does not ship in this build
  * environment (SURVEY.md §2.1 S1), so [[stream]] is guarded: it raises
  * a clear IllegalStateException when the provider class is absent,
  * instead of Spark's generic DataSource-lookup failure. With the
  * connector on the classpath (any standard Spark distribution) this
  * class is fully functional — the option mapping is spec-verified.
  */
final class KafkaTickSource(
    bootstrapServers: String,
    topic: String,
    opts: SourceOptions = SourceOptions(),
    maxOffsetsPerTrigger: Option[Long] = None) extends TickSource {

  /** The exact reader options passed to `readStream.format("kafka")`.
    * earliest/latest normalize case; a JSON per-partition offsets spec
    * (also valid for this option) passes through verbatim — topic names
    * inside it are case-sensitive.
    */
  def options: Map[String, String] = {
    val so = opts.startingOffsets.trim match {
      case s if s.equalsIgnoreCase("earliest") || s.equalsIgnoreCase("latest") =>
        s.toLowerCase
      case s => s
    }
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> so,
      "failOnDataLoss" -> opts.failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)
  }

  override def stream(spark: SparkSession): DataFrame = {
    if (!KafkaTickSource.providerAvailable)
      throw new IllegalStateException(
        "KafkaTickSource needs the spark-sql-kafka-0-10 connector on the " +
          "classpath (org.apache.spark:spark-sql-kafka-0-10_2.13). Add the " +
          "package, or use FileTickSource/MemoryTickSource for jar-free runs.")
    options.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
      // Kafka value is binary; the wire format is JSON text (P1 cast,
      // reference parse_kafka parity)
      .selectExpr("CAST(value AS STRING) AS value")
  }
}

object KafkaTickSource {
  /** True when the spark-sql-kafka connector is on the classpath. */
  def providerAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }
}

/** Rate-source generator: `tps` synthetic ticks/sec round-robin across
  * symbols with a deterministic GBM price path — the reference producer
  * (synthetic_ticks.py) as a Spark-native source transform.
  */
final class RateTickSource(tps: Int, symbols: Seq[String])
    extends TickSource {
  override def stream(spark: SparkSession): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", tps).load()
    // value column: JSON payload with GBM-ish price derived from the
    // deterministic row index (seeded; no RNG state across batches).
    val sym = element_at(
      array(symbols.map(lit): _*),
      (pmod(col("value"), lit(symbols.size.toLong)) + 1).cast("int"))
    val price = round(lit(100.0) * exp(
      sin(col("value").cast("double") * 0.7) * 0.01), 4)
    raw.select(to_json(struct(
      sym.as("symbol"),
      price.as("price"),
      unix_millis(col("timestamp")).as("event_time_ms"))).as("value"))
  }
}
