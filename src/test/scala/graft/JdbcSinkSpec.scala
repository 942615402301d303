package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row

import graft.streaming.JdbcSink

/** The distributed warehouse sink: per-partition writers, bounded batch
  * sizes, no driver funnel. A recording writer stands in for the JDBC
  * driver (none ships in this environment); in local mode executor
  * threads share the JVM, so a static queue observes executor-side calls.
  */
object RecordingWriters {
  // (partitionId, batchRowCount) per writeBatch call; partitionId -1 = close
  val calls = new ConcurrentLinkedQueue[(Int, Int)]()
  val threads = new ConcurrentLinkedQueue[String]()

  class Factory extends JdbcSink.BatchWriterFactory {
    override def open(partitionId: Int, batchId: Long): JdbcSink.RowBatchWriter =
      new JdbcSink.RowBatchWriter {
        override def writeBatch(rows: Seq[Row]): Unit = {
          calls.add((partitionId, rows.size))
          threads.add(Thread.currentThread().getName)
        }
        override def close(): Unit = calls.add((partitionId, -1))
      }
  }
}

class JdbcSinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("writePartitioned batches executor-side per partition, no driver funnel") {
    RecordingWriters.calls.clear()
    RecordingWriters.threads.clear()
    val df = spark.range(0, 1000).repartition(4).toDF("id")
    JdbcSink.writePartitioned(df, batchId = 7L, batchSize = 64,
      new RecordingWriters.Factory)

    val calls = RecordingWriters.calls.asScala.toSeq
    val writes = calls.filter(_._2 >= 0)
    val closes = calls.filter(_._2 == -1)
    // all 1000 rows arrived, in batches never exceeding batchSize
    assert(writes.map(_._2).sum == 1000)
    assert(writes.forall(_._2 <= 64), writes.filter(_._2 > 64).toString)
    // work fanned out across partitions, one close per partition
    assert(writes.map(_._1).distinct.size == 4)
    assert(closes.map(_._1).distinct.size == 4)
    // batching ran on executor task threads, not the driver thread
    assert(RecordingWriters.threads.asScala.forall(_.contains("Executor task launch")),
      RecordingWriters.threads.asScala.toSet.toString)
  }

  test("foreachBatchSink adapts writePartitioned to the foreachBatch signature") {
    RecordingWriters.calls.clear()
    val sink = JdbcSink.foreachBatchSink(10, new RecordingWriters.Factory)
    sink(spark.range(0, 25).repartition(1).toDF("id"), 0L)
    val writes = RecordingWriters.calls.asScala.filter(_._2 >= 0)
    assert(writes.map(_._2).sum == 25)
    // 25 rows at batchSize 10 → 10+10+5
    assert(writes.map(_._2).toSeq.sorted == Seq(5, 10, 10))
  }

  test("rejects non-positive batch size") {
    intercept[IllegalArgumentException] {
      JdbcSink.writePartitioned(spark.range(1).toDF("id"), 0L, 0,
        new RecordingWriters.Factory)
    }
  }

  test("features DDL covers every sink column of the streaming pipeline") {
    for (c <- Seq("symbol", "window_start", "window_end", "first_price",
        "last_price", "log_return", "volatility", "num_ticks",
        "max_event_time_ms", "ingest_ts", "latency_ms"))
      assert(JdbcSink.FeaturesTableDdl.contains(c), c)
  }

  /** A minimal warehouse fake honoring the two idempotent DDL forms the
    * migration emits — stands in for a live DB's DDL engine.
    */
  private class FakeWarehouse {
    val tables = scala.collection.mutable.Map.empty[String, Vector[String]]
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    private val create = """(?s)CREATE TABLE IF NOT EXISTS (\w+) \((.*)\)""".r
    private val alter =
      """ALTER TABLE (\w+) ADD COLUMN IF NOT EXISTS (\w+) (.+)""".r
    def execute(sql: String): Unit = {
      executed += sql
      sql match {
        case create(t, cols) =>
          if (!tables.contains(t))
            tables(t) = cols.split(",").toVector
              .map(_.trim.split("\\s+")(0))
        case alter(t, c, _) =>
          val cur = tables.getOrElse(t,
            throw new IllegalStateException(s"no table $t"))
          if (!cur.contains(c)) tables(t) = cur :+ c
        case other => throw new IllegalStateException(s"unexpected DDL: $other")
      }
    }
  }

  test("migrate: an old-schema table gains the new columns idempotently " +
      "and writes against the migrated schema succeed") {
    val wh = new FakeWarehouse
    // pre-existing table from before latency tracking existed
    wh.execute("CREATE TABLE IF NOT EXISTS features (\n  symbol text,\n" +
      "  window_start timestamp\n)")
    assert(wh.tables("features") == Vector("symbol", "window_start"))

    JdbcSink.migrate(wh.execute, "features", JdbcSink.FeaturesColumns)
    val want = JdbcSink.FeaturesColumns.map(_.name).toVector
    // drifted columns added, original order preserved for existing ones
    assert(wh.tables("features").toSet == want.toSet)
    assert(wh.tables("features").take(2) == Vector("symbol", "window_start"))

    // rerun is a no-op on the schema (idempotent)
    val before = wh.tables("features")
    JdbcSink.migrate(wh.execute, "features", JdbcSink.FeaturesColumns)
    assert(wh.tables("features") == before)

    // and the streaming sink's rows now fit the migrated table: a
    // validating writer asserts every row matches the warehouse schema
    val cols = wh.tables("features")
    RecordingWriters.calls.clear()
    val df = spark.range(0, 10).selectExpr(
      "cast(id as string) as symbol",
      "current_timestamp() as window_start",
      "current_timestamp() as window_end",
      "cast(id as double) as first_price",
      "cast(id as double) as last_price",
      "cast(0.0 as double) as log_return",
      "cast(0.0 as double) as volatility",
      "id as num_ticks",
      "id as max_event_time_ms",
      "current_timestamp() as ingest_ts",
      "id as latency_ms")
    assert(df.schema.fieldNames.toVector == cols)
    JdbcSink.writePartitioned(df, 0L, 4, new RecordingWriters.Factory)
    assert(RecordingWriters.calls.asScala.filter(_._2 >= 0).map(_._2).sum == 10)
  }

  test("columnsFor maps a Spark schema to portable SQL types") {
    import org.apache.spark.sql.types._
    val cols = JdbcSink.columnsFor(StructType(Seq(
      StructField("s", StringType), StructField("d", DoubleType),
      StructField("l", LongType), StructField("t", TimestampType),
      StructField("m", DecimalType(18, 2)))))
    assert(cols == Seq(
      JdbcSink.ColumnDef("s", "text"),
      JdbcSink.ColumnDef("d", "double precision"),
      JdbcSink.ColumnDef("l", "bigint"),
      JdbcSink.ColumnDef("t", "timestamp"),
      JdbcSink.ColumnDef("m", "decimal(18,2)")))
    intercept[IllegalArgumentException] {
      JdbcSink.columnsFor(StructType(Seq(
        StructField("a", ArrayType(StringType)))))
    }
  }
}
