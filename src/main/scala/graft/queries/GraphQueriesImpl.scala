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

  /** Bounded-depth BFS reachability via a RECURSIVE CTE (Spark 4's
    * `WITH RECURSIVE` — planned through `UnionLoop`, the iterative
    * union operator): hop distances from a seed supplier over the
    * symmetric co-purchase graph, depth ≤ [[BfsDepth]]. The recursive
    * step DEDUPS its frontier (`SELECT DISTINCT`), so each level is
    * bounded by |V| nodes — a path-enumerating step without it is
    * combinatorial (measured: depth 3 at sf0.01 exceeds Spark's 10⁶
    * recursion row limit; the deduped form is ~|V| per level at any
    * scale, the formulation that survives a 100× graph). A node
    * re-reached at a deeper level still re-expands, so the outer
    * `min(dist)` per node collapses levels to the true BFS distance —
    * identical set semantics in DuckDB, engine-independent by
    * construction. Each step joins only the PREVIOUS level against
    * the edge list — a keyed equijoin per level, never a re-scan of
    * accumulated levels.
    */
  def reachabilityQ(s: SparkSession, dir: String): DataFrame = {
    // materialize the edge list BEFORE the recursion: UnionLoop
    // re-evaluates the recursive step's whole subtree every level, so
    // an edges CTE would re-run the 600k-row DISTINCT scan per hop
    // (measured at sf0.1, 4 cores: 8.7s → 4.8s from hoisting it once)
    val li = Tables.load(s, dir, "lineitem")
    val e0 = li.select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .transform(graft.extra.Dedup.materialize)
      .createOrReplaceTempView("bfs_edges_v")
    s.sql(
      s"""WITH RECURSIVE edges AS (
         |  SELECT src, dst FROM bfs_edges_v),
         |reach AS (
         |  SELECT 's1' AS id, 0 AS dist
         |  UNION ALL
         |  SELECT DISTINCT e.dst AS id, r.dist + 1 AS dist
         |  FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.dist < $BfsDepth),
         |bfs AS (SELECT id, CAST(min(dist) AS INT) AS dist
         |  FROM reach GROUP BY id)
         |SELECT dist, count(*) AS n_nodes, min(id) AS first_id,
         |  max(id) AS last_id
         |FROM bfs GROUP BY dist ORDER BY dist""".stripMargin)
  }

  private val BfsDepth = 3

  private val reachabilityOracle =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
       |  FROM lineitem),
       |edges AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |reach AS (
       |  SELECT 's1' AS id, 0 AS dist
       |  UNION ALL
       |  SELECT DISTINCT e.dst AS id, r.dist + 1 AS dist
       |  FROM reach r JOIN edges e ON e.src = r.id
       |  WHERE r.dist < $BfsDepth),
       |bfs AS (SELECT id, CAST(min(dist) AS INT) AS dist
       |  FROM reach GROUP BY id)
       |SELECT dist, count(*) AS n_nodes, min(id) AS first_id,
       |  max(id) AS last_id
       |FROM bfs GROUP BY dist ORDER BY dist""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pagerank",
      s"PageRank, $Iters fixed decimal-exact iterations, unrolled oracle",
      pagerankQ, Some(pagerankOracle)),
    QueryDef("reachability_bfs",
      s"recursive-CTE BFS hop distances (depth $BfsDepth) from a seed node",
      reachabilityQ, Some(reachabilityOracle)))
}
