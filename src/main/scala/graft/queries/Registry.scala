package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names and row order must agree exactly between the two
  * (the driver sorts columns by name and hash-compares values).
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, in registration order. */
  def all: Seq[QueryDef] =
    CoreQueries.defs ++
      RelationalQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      TextQueries.defs ++
      MultimodalQueries.defs ++
      TimeSeriesQueries.defs ++
      AnalyticsQueries.defs ++
      GraphQueries.defs ++
      QualityQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
