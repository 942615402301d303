package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Graph
import graft.model.Tables

/** Graph queries: PageRank over the supplier–part co-purchase graph
  * (symmetric edges from lineitem, so no dangling nodes — see
  * [[graft.extra.Graph.pagerank]]). The oracle UNROLLS the 10-iteration
  * recurrence as chained CTEs, built programmatically — both engines
  * replay the identical decimal-exact update.
  */
object GraphQueriesImpl {

  private val Iters = 10

  def pagerankQ(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val e0 = li.select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      .distinct()
    val edges = e0.union(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pagerank(edges, "src", "dst", iters = Iters)
      .orderBy("id")
  }

  /** The oracle replays the IDENTICAL integer fixed-point recurrence
    * (`//` is DuckDB floor division = Spark `div` on non-negative
    * BIGINTs; sums are exact integers), so equality is bit-for-bit by
    * construction — no float rounding frontier anywhere.
    */
  private val pagerankOracle: String = {
    val iterCtes = (1 to Iters).map { i =>
      s"""r$i AS (SELECT n.id,
         |  (1000000000000 * 15 // 100) // (SELECT count(*) FROM nodes)
         |    + (85 * coalesce(s.m, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r.r // o.deg) AS BIGINT) AS m
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.id
         |    JOIN outdeg o ON e.src = o.src
         |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
       |  'p' || l_partkey AS dst FROM lineitem),
       |edges AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS id FROM edges
       |  UNION SELECT dst FROM edges),
       |r0 AS (SELECT id,
       |  1000000000000 // (SELECT count(*) FROM nodes) AS r FROM nodes),
       |$iterCtes
       |SELECT id, CAST(r AS BIGINT) AS rank_e12,
       |  CAST(r AS DOUBLE)/1000000000000.0 AS rank
       |FROM r$Iters ORDER BY id""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pagerank",
      s"PageRank, $Iters fixed decimal-exact iterations, unrolled oracle",
      pagerankQ, Some(pagerankOracle)))
}
