package graft

import graft.streaming.{KafkaTickSource, SourceOptions}

/** The compile-ready Kafka source: reference option mapping
  * (spark_streaming.py:315-322) and the jar-absent guard. No connector
  * jar ships in this environment, so stream() must fail with the clear
  * guidance message, not Spark's generic source-lookup error.
  */
class KafkaSourceSpec extends SparkSpec {

  test("reader options mirror the reference's Kafka reader verbatim") {
    val src = new KafkaTickSource("broker1:9092,broker2:9092", "ticks",
      SourceOptions(startingOffsets = "LATEST", failOnDataLoss = true),
      maxOffsetsPerTrigger = Some(50000L))
    assert(src.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "ticks",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> "50000"))
  }

  test("JSON per-partition offsets pass through case-intact") {
    val json = """{"Ticks":{"0":23,"1":-2}}"""
    val src = new KafkaTickSource("localhost:9092", "Ticks",
      SourceOptions(startingOffsets = json))
    assert(src.options("startingOffsets") == json)
  }

  test("defaults: earliest offsets, tolerant of data loss, no batch cap") {
    val src = new KafkaTickSource("localhost:9092", "ticks")
    assert(src.options("startingOffsets") == "earliest")
    assert(src.options("failOnDataLoss") == "false")
    assert(!src.options.contains("maxOffsetsPerTrigger"))
  }

  // CURRENCY CHECK for the env-blocked live leg (no connector jar in
  // this sandbox, so nothing else would catch a rotten option name):
  // every option this source emits must be a real Spark 4.x
  // structured-streaming Kafka reader option. The table is the
  // published option list of spark-sql-kafka-0-10 (Structured
  // Streaming + Kafka Integration Guide, Spark 4.1) — the connector
  // matches names case-insensitively, so compare lowercased.
  private val spark41KafkaReaderOptions = Set(
    // subscription (exactly one of)
    "assign", "subscribe", "subscribepattern",
    // offsets / limits
    "startingoffsets", "endingoffsets",
    "startingoffsetsbytimestamp", "endingoffsetsbytimestamp",
    "startingtimestamp", "endingtimestamp",
    "startingoffsetsbytimestampstrategy",
    "maxoffsetspertrigger", "minoffsetspertrigger", "maxtriggerdelay",
    // behavior
    "failondataloss", "kafkaconsumer.polltimeoutms",
    "fetchoffset.numretries", "fetchoffset.retryintervalms",
    "maxrecordsperpartition",
    "minpartitions", "groupidprefix", "includeheaders",
    // pass-through consumer configs keep their kafka. prefix
    "kafka.bootstrap.servers", "kafka.group.id")

  test("every emitted option name is a current Spark 4.1 Kafka reader " +
      "option (rot guard for the jar-blocked live leg)") {
    val src = new KafkaTickSource("b:9092", "ticks",
      SourceOptions(startingOffsets = "earliest", failOnDataLoss = true),
      maxOffsetsPerTrigger = Some(1L))
    val unknown = src.options.keySet
      .filterNot(k => spark41KafkaReaderOptions.contains(k.toLowerCase))
    assert(unknown.isEmpty,
      s"option name(s) not in the Spark 4.1 kafka reader option table: " +
        s"${unknown.mkString(", ")}")
  }

  test("the full reference reader option set is emitted byte-for-byte " +
      "(spark_streaming.py:315-322)") {
    // reference: kafka.bootstrap.servers, subscribe, startingOffsets,
    // failOnDataLoss — with startingOffsets ∈ {earliest, latest} and
    // failOnDataLoss hard-coded "false"
    val src = new KafkaTickSource("kafka:9092", "market.ticks")
    assert(Set("kafka.bootstrap.servers", "subscribe",
      "startingOffsets", "failOnDataLoss").subsetOf(src.options.keySet))
    assert(src.options("failOnDataLoss") == "false")
    assert(Set("earliest", "latest")
      .contains(src.options("startingOffsets")))
  }

  test("without the connector jar, stream() raises the clear guard error") {
    assume(!KafkaTickSource.providerAvailable)
    val e = intercept[IllegalStateException] {
      new KafkaTickSource("localhost:9092", "ticks").stream(spark)
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
    assert(e.getMessage.contains("FileTickSource"))
  }
}
