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

  /** Exact triangle census + global clustering coefficient over the
    * Q1-1995 part co-purchase graph (parts sharing an order whose
    * `o_orderdate` falls in the quarter — the window keys on the ORDER
    * date so each order's clique survives intact; a `l_shipdate` window
    * fragments orders, whose lineitems ship months apart). The quarter
    * scopes the census the way temporal graph analytics does — a
    * bounded snapshot of an unbounded stream of interactions; the
    * operator itself ([[graft.extra.Graph.triangles]]) is
    * degree-oriented and scales to the full graph.
    *
    * The oracle replays the identical orientation + wedge-close joins;
    * every output is an exact integer except `global_cc`, one double
    * division of two integers (round 6dp) — engine-independent.
    */
  def triangleQ(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey").as("ok"))
    val li = Tables.load(s, dir, "lineitem")
    // orders-in-window is |orders|/28 — broadcast it into the lineitem
    // scan rather than shuffling the fact table.
    val op = li.join(broadcast(orders), li("l_orderkey") === orders("ok"))
      .select(col("l_orderkey").as("ok2"), col("l_partkey").as("p"))
      .distinct()
    val a = op.select(col("ok2"), col("p").as("pa"))
    val b = op.select(col("ok2"), col("p").as("pb"))
    val edges = a.join(b, Seq("ok2")).where(col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
    Graph.triangles(edges, "src", "dst")
  }

  private val triangleOracle =
    """WITH o_win AS (SELECT o_orderkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1995-04-01'),
      |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
      |  FROM lineitem JOIN o_win ON l_orderkey = o_orderkey),
      |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
      |deg AS (SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY 1),
      |o AS (SELECT
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |      THEN u ELSE v END AS s,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |      THEN v ELSE u END AS t,
      |    greatest(du.d, dv.d) AS td
      |  FROM e0 JOIN deg du ON e0.u = du.node
      |    JOIN deg dv ON e0.v = dv.node),
      |w AS (SELECT e1.t AS ws, e2.t AS wt
      |  FROM o e1 JOIN o e2 ON e1.s = e2.s
      |    AND (e1.td < e2.td OR (e1.td = e2.td AND e1.t < e2.t))),
      |tri AS (SELECT count(*) AS n_triangles
      |  FROM w SEMI JOIN o ON w.ws = o.s AND w.wt = o.t)
      |SELECT (SELECT count(*) FROM deg) AS n_nodes,
      |  (SELECT count(*) FROM e0) AS n_edges,
      |  (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg)
      |    AS n_wedges,
      |  n_triangles,
      |  CASE WHEN (SELECT sum(d * (d - 1) // 2) FROM deg) = 0 THEN 0.0
      |    ELSE round(3e0 * n_triangles /
      |      (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg), 6)
      |    END AS global_cc
      |FROM tri""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pagerank",
      s"PageRank, $Iters fixed decimal-exact iterations, unrolled oracle",
      pagerankQ, Some(pagerankOracle)),
    QueryDef("reachability_bfs",
      s"recursive-CTE BFS hop distances (depth $BfsDepth) from a seed node",
      reachabilityQ, Some(reachabilityOracle)),
    QueryDef("triangle_count",
      "degree-oriented exact triangle census + clustering coefficient",
      triangleQ, Some(triangleOracle)))
}
