package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** Distributed JDBC/warehouse sink — the analog of the reference's
  * TimescaleDB path (spark_streaming.py:181-243) with the driver funnel
  * removed: the reference collects every micro-batch to the driver
  * (`toPandas()`, spark_streaming.py:200) and runs one giant batched
  * INSERT over a single connection (`mogrify` loop, :232-241). At scale
  * the driver funnel dies first, so here each PARTITION opens its own
  * writer and inserts in bounded-size batches — N executors × M
  * partitions push concurrently, nothing routes through the driver.
  *
  * The actual wire protocol is pluggable via [[BatchWriterFactory]]
  * (serialized to executors): production wires a JDBC
  * PreparedStatement.addBatch/executeBatch writer; tests inject a
  * recording writer. For plain JDBC targets Spark's own distributed
  * writer is exposed as [[foreachBatchJdbc]] — also per-partition
  * connections, `batchsize`-chunked inserts.
  */
object JdbcSink {

  /** Executor-side writer for one partition of one micro-batch. */
  trait RowBatchWriter {
    /** Insert one bounded batch of rows (≤ batchSize). */
    def writeBatch(rows: Seq[Row]): Unit
    /** Commit/close the partition's connection. */
    def close(): Unit
  }

  /** Factory shipped to executors — one open() per (partition, epoch). */
  trait BatchWriterFactory extends Serializable {
    def open(partitionId: Int, batchId: Long): RowBatchWriter
  }

  /** Write `df` through per-partition writers in batches of `batchSize`
    * rows — executor-side only; the driver never sees a row. Call inside
    * `foreachBatch` for streaming, or directly for batch frames.
    */
  def writePartitioned(df: DataFrame, batchId: Long, batchSize: Int,
      factory: BatchWriterFactory): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    df.foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val w = factory.open(pid, batchId)
      try it.grouped(batchSize).foreach(g => w.writeBatch(g))
      finally w.close()
    }
  }

  /** A `foreachBatch` sink function writing through [[writePartitioned]]:
    * {{{
    * df.writeStream.foreachBatch(JdbcSink.foreachBatchSink(1000, factory))
    * }}}
    */
  def foreachBatchSink(batchSize: Int, factory: BatchWriterFactory)
      : (DataFrame, Long) => Unit =
    (df, batchId) => writePartitioned(df, batchId, batchSize, factory)

  /** A `foreachBatch` sink using Spark's built-in distributed JDBC
    * writer (per-partition connections, `batchsize`-chunked inserts) —
    * the zero-code path when a JDBC driver jar for the target is on the
    * classpath. Mirrors the reference's insert target
    * (spark_streaming.py:203-214 `features` table).
    */
  def foreachBatchJdbc(url: String, table: String,
      connectionProperties: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 1000): (DataFrame, Long) => Unit =
    (df, _) => {
      val props = new java.util.Properties()
      props.putAll(connectionProperties)
      props.setProperty("batchsize", batchSize.toString)
      df.write.mode("append").jdbc(url, table, props)
    }

  /** One target column of a warehouse table, as portable SQL. */
  final case class ColumnDef(name: String, sqlType: String)

  /** Map a Spark schema to portable SQL column definitions — the bridge
    * from an evolving `Dataset` schema to [[migrate]].
    */
  def columnsFor(schema: org.apache.spark.sql.types.StructType): Seq[ColumnDef] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.map { f =>
      val t = f.dataType match {
        case StringType => "text"
        case DoubleType => "double precision"
        case FloatType => "real"
        case LongType => "bigint"
        case IntegerType => "integer"
        case BooleanType => "boolean"
        case TimestampType => "timestamp"
        case DateType => "date"
        case d: DecimalType => s"decimal(${d.precision},${d.scale})"
        case BinaryType => "bytea"
        case other =>
          throw new IllegalArgumentException(
            s"no portable SQL type mapping for column ${f.name}: $other")
      }
      ColumnDef(f.name, t)
    }
  }

  def createTableDdl(table: String, columns: Seq[ColumnDef]): String =
    columns.map(c => s"  ${c.name} ${c.sqlType}")
      .mkString(s"CREATE TABLE IF NOT EXISTS $table (\n", ",\n", "\n)")

  /** Idempotent schema-drift migration, reference parity
    * (spark_streaming.py:161-164, 228-231): `CREATE TABLE IF NOT EXISTS`
    * with the full target schema, then one
    * `ALTER TABLE ADD COLUMN IF NOT EXISTS` per column — a pre-existing
    * table that predates newly added feature columns gains them, an
    * up-to-date table is untouched, and reruns are no-ops. Driver-side
    * and once per query start (NOT per batch) — DDL is control-plane.
    */
  def migrationDdl(table: String, columns: Seq[ColumnDef]): Seq[String] =
    createTableDdl(table, columns) +: columns.map(c =>
      s"ALTER TABLE $table ADD COLUMN IF NOT EXISTS ${c.name} ${c.sqlType}")

  /** Run the migration through any statement executor (a JDBC
    * `Statement.execute`, a warehouse client, or a recording fake in
    * specs).
    */
  def migrate(execute: String => Unit, table: String,
      columns: Seq[ColumnDef]): Unit =
    migrationDdl(table, columns).foreach(execute)

  /** Target columns of the reference's `features` sink table
    * (spark_streaming.py:203-214).
    */
  val FeaturesColumns: Seq[ColumnDef] = Seq(
    ColumnDef("symbol", "text"),
    ColumnDef("window_start", "timestamp"),
    ColumnDef("window_end", "timestamp"),
    ColumnDef("first_price", "double precision"),
    ColumnDef("last_price", "double precision"),
    ColumnDef("log_return", "double precision"),
    ColumnDef("volatility", "double precision"),
    ColumnDef("num_ticks", "bigint"),
    ColumnDef("max_event_time_ms", "bigint"),
    ColumnDef("ingest_ts", "timestamp"),
    ColumnDef("latency_ms", "bigint"))

  /** DDL for the reference's `features` sink table
    * (spark_streaming.py:203-214), as portable ANSI SQL. The reference
    * additionally converts it to a TimescaleDB hypertable partitioned on
    * window_start (:219-227) — on a plain warehouse, partition/cluster
    * by `window_start` for the same pruning effect.
    */
  val FeaturesTableDdl: String = createTableDdl("features", FeaturesColumns)
}
