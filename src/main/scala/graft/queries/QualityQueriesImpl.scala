package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Quality
import graft.model.Tables

/** Dataset-quality queries: snapshot diff between two deterministic
  * corpus versions, and a dbt-style check report over the relational
  * tables. See [[graft.extra.Quality]].
  */
object QualityQueriesImpl {

  /** Synthetic "version 2" of the documents table, derived
    * deterministically so both engines build the identical snapshot:
    * every 10th doc deleted, every 7th (surviving) doc's text amended,
    * and fresh doc_ids appended past the max.
    */
  private def docsV2(d: DataFrame): DataFrame = {
    val survivors = d.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val added = d.filter(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    survivors.unionByName(added)
  }

  def snapshotDiffQ(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    Quality.snapshotDiff(d, docsV2(d), "doc_id", Seq("text"))
      .orderBy("doc_id")
  }

  private val snapshotDiffOracle =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 13 = 0),
      |o AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, ''),
      |  CAST(text IS NULL AS VARCHAR))) AS h FROM documents),
      |n AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, ''),
      |  CAST(text IS NULL AS VARCHAR))) AS h FROM v2),
      |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.h IS NULL THEN 'added'
      |       WHEN n.h IS NULL THEN 'removed'
      |       WHEN o.h <> n.h THEN 'changed' END AS status
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT doc_id, status FROM j WHERE status IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
    val cust = Tables.load(s, dir, "customer")
    Quality.checkAll(
      Quality.rowChecks(li, Seq(
        "lineitem_null_orderkey" -> col("l_orderkey").isNull,
        "lineitem_bad_discount" ->
          (col("l_discount") < 0 || col("l_discount") > 1),
        "lineitem_nonpositive_qty" -> (col("l_quantity") <= 0))) ++
      Seq(
        Quality.duplicateKeys(ord, Seq("o_orderkey"),
          "orders_duplicate_key"),
        Quality.orphans(li, "l_orderkey", ord, "o_orderkey",
          "lineitem_orphan_orderkey"),
        Quality.orphans(ord, "o_custkey", cust, "c_custkey",
          "orders_orphan_custkey")))
  }

  private val dqOracle =
    """SELECT * FROM (
      |  SELECT 'lineitem_null_orderkey' AS check_name,
      |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_violations FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_bad_discount',
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
      |             THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_nonpositive_qty',
      |    CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_duplicate_key',
      |    CAST(coalesce(sum(c - 1), 0) AS BIGINT)
      |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |) ORDER BY check_name""".stripMargin

  def profileEvents(s: SparkSession, dir: String): DataFrame =
    Quality.profile(Tables.load(s, dir, "events"),
      Seq("event_id", "user_id", "event_type", "value", "props"))

  private val profileOracle =
    """SELECT * FROM (
      |  SELECT 'event_id' AS col_name, count(event_id) AS n_nonnull,
      |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_null,
      |    count(DISTINCT event_id) AS n_distinct FROM events
      |  UNION ALL
      |  SELECT 'user_id', count(user_id),
      |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT user_id) FROM events
      |  UNION ALL
      |  SELECT 'event_type', count(event_type),
      |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT),
      |    count(DISTINCT event_type) FROM events
      |  UNION ALL
      |  SELECT 'value', count(value),
      |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT value) FROM events
      |  UNION ALL
      |  SELECT 'props', count(props),
      |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT props) FROM events
      |) ORDER BY col_name""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("profile_events",
      "ANALYZE-style column profile: nulls + exact distincts, one scan",
      profileEvents, Some(profileOracle)),
    QueryDef("snapshot_diff",
      "corpus version diff: added/removed/changed by payload hash",
      snapshotDiffQ, Some(snapshotDiffOracle)),
    QueryDef("dq_checks",
      "dbt-style data-quality report: nulls, ranges, dup keys, orphans",
      dqChecks, Some(dqOracle)))
}
