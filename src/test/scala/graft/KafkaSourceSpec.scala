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

  test("without the connector jar, stream() raises the clear guard error") {
    assume(!KafkaTickSource.providerAvailable)
    val e = intercept[IllegalStateException] {
      new KafkaTickSource("localhost:9092", "ticks").stream(spark)
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
    assert(e.getMessage.contains("FileTickSource"))
  }
}
