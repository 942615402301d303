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
    // Iterate on LONG-encoded node ids (supplier k → 2k, part k →
    // 2k+1 — the reachabilityQ trick): the recurrence depends only on
    // the graph STRUCTURE and N, both preserved by the bijective
    // encoding, so every node's rank is bit-identical to the
    // string-id run the oracle replays; the 's…'/'p…' ids the oracle
    // speaks reappear as a projection over the |V|-row result
    // (measured at sf0.1: the 10 iterations hash 1.18M ids each —
    // longs cut the per-iteration explode+aggregate wall ~2× vs
    // strings).
    val li = Tables.load(s, dir, "lineitem")
    val e0 = li.select(
        (col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pagerank(edges, "src", "dst", iters = Iters)
      .select(
        when(col("id") % 2 === 0, concat(lit("s"), expr("id div 2")))
          .otherwise(concat(lit("p"), expr("(id - 1) div 2"))).as("id"),
        col("rank_e12"), col("rank"))
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

  /** Bounded-depth BFS reachability: hop distances from a seed
    * supplier over the symmetric co-purchase graph, depth ≤
    * [[BfsDepth]], via [[graft.extra.Graph.bfs]] — a Scala-driven loop
    * of keyed frontier joins (frontier materialized per level so it
    * broadcasts while small; each node enters the frontier exactly
    * once, so total work is |E| touched per level plus |V| frontier
    * rows — never path-enumerating). The recursive-CTE formulation
    * (Spark 4 `WITH RECURSIVE` planned through `UnionLoop`) computes
    * the identical result — GraphSpec pins the equivalence — but
    * re-plans and re-executes the step subtree per level at full
    * shuffle width over a post-level-1 frontier that is tiny
    * (measured at sf0.1: 6.7 s recursive vs ~1 s here), so the driven
    * loop is the registered shape. The oracle replays DuckDB's
    * recursive CTE with a `min(dist)` collapse — first-visit distance
    * and min-over-reexpansions agree by BFS induction, so the two
    * formulations are engine-independently equal.
    */
  def reachabilityQ(s: SparkSession, dir: String): DataFrame = {
    // Traverse on LONG-encoded node ids (supplier k → 2k, part k →
    // 2k+1) and skip the edge-list dedup entirely: BFS is
    // duplicate-insensitive (the per-level frontier distinct collapses
    // them), so paying a full fact-table distinct shuffle up front
    // buys nothing, and long keys make the per-level distinct/join
    // hashing ~2× cheaper than 's…'/'p…' strings (measured at sf0.1:
    // 3.5 s → ~1.3 s). The string ids the oracle speaks reappear as a
    // projection over the |V|-row result, BEFORE the final tiny
    // aggregate — min/max(first_id/last_id) order over strings is
    // preserved because the projection is applied pre-aggregation.
    val li = Tables.load(s, dir, "lineitem")
    // The co-purchase graph is BIPARTITE (suppliers on one side, parts
    // on the other), so a symmetric-closure BFS wastes half of every
    // level's scan: from a supplier seed, odd levels can only cross
    // supplier→part edges and even levels part→supplier. bfsLevels
    // feeds each level just its one-directional half — |E| rows per
    // level instead of 2|E|, from a bare two-column fact projection.
    val sp = li.select((col("l_suppkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"))
    val ps = li.select((col("l_partkey") * 2 + 1).as("src"),
      (col("l_suppkey") * 2).as("dst"))
    Graph.bfsLevels(lvl => if (lvl % 2 == 1) sp else ps,
        lit(2L), BfsDepth) // seed: supplier 1
      .select(col("dist"),
        when(col("id") % 2 === 0, concat(lit("s"), expr("id div 2")))
          .otherwise(concat(lit("p"), expr("(id - 1) div 2"))).as("id"))
      .groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), min("id").as("first_id"),
        max("id").as("last_id"))
      .orderBy("dist")
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

  /** Connected components of the Q1-1995 part co-purchase graph (the
    * same bounded temporal snapshot [[triangleQ]] censuses — parts
    * sharing an order in the quarter): each part labeled with its
    * component's minimum part key via
    * [[graft.extra.Graph.connectedComponents]] — min-label propagation
    * with pointer doubling over a partition-locally CONTRACTED edge
    * frame (r16: union-find per partition first — the loop sees star
    * edges, ≤3 rounds measured at sf0.1 vs 9 uncontracted); the result
    * is the TRUE component labeling (the operator throws rather than
    * return unconverged labels, and [[CcIters]] = 16 carries headroom —
    * post-fixpoint rounds are the identity, so oracle-side headroom
    * costs Spark nothing, and the contraction preserves connectivity
    * exactly so the fixpoint labels are bit-identical). The
    * oracle unrolls the identical two-step round as chained
    * materialized CTEs (the [[pagerankQ]] trick) — each round is a
    * pure integer function of the input, so both engines replay it
    * exactly.
    */
  def connectedComponentsQ(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey").as("ok"))
    val li = Tables.load(s, dir, "lineitem")
    val op = li.join(broadcast(orders), li("l_orderkey") === orders("ok"))
      .select(col("l_orderkey").as("ok2"), col("l_partkey").as("p"))
      .distinct()
    val a = op.select(col("ok2"), col("p").as("pa"))
    val b = op.select(col("ok2"), col("p").as("pb"))
    val edges = a.join(b, Seq("ok2")).where(col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
    Graph.connectedComponents(edges, "src", "dst", maxIters = CcIters)
      .orderBy("id")
  }

  private val CcIters = 16

  /** Replays [[graft.extra.Graph.connectedComponents]]' two-step round
    * exactly: `p_i` = min of own and neighbors' labels (the self-label
    * rides a self-loop added to the edge list, so the CTE references
    * the previous round exactly once), `c_i` = the pointer-doubling
    * shortcut `lab := lab(lab)`. The jump CTE references `p_i` twice,
    * so every round CTE is `AS MATERIALIZED` — an inlining planner
    * would otherwise re-evaluate the chain 2^rounds times. Spark's
    * early convergence exit cannot diverge: post-fixpoint rounds are
    * the identity for both steps.
    */
  private val ccOracle: String = {
    val iterCtes = (1 to CcIters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT e.dst AS id, min(c.component) AS component
         |  FROM edges e JOIN c${i - 1} c ON e.src = c.id
         |  GROUP BY 1),
         |c$i AS MATERIALIZED (
         |  SELECT a.id, b.component
         |  FROM p$i a JOIN p$i b ON a.component = b.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH o_win AS (SELECT o_orderkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
       |    AND o_orderdate < TIMESTAMP '1995-04-01'),
       |op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |  FROM lineitem JOIN o_win ON l_orderkey = o_orderkey),
       |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
       |edges AS (SELECT u AS src, v AS dst FROM e0
       |  UNION ALL SELECT v AS src, u AS dst FROM e0
       |  UNION ALL SELECT DISTINCT u AS src, u AS dst FROM e0
       |  UNION ALL SELECT DISTINCT v AS src, v AS dst FROM e0),
       |c0 AS (SELECT DISTINCT src AS id, src AS component FROM edges),
       |$iterCtes
       |SELECT id, component FROM c$CcIters ORDER BY id""".stripMargin
  }

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
      s"Scala-driven frontier BFS hop distances (depth $BfsDepth) " +
        "from a seed node; recursive-CTE oracle",
      reachabilityQ, Some(reachabilityOracle)),
    QueryDef("triangle_count",
      "degree-oriented exact triangle census + clustering coefficient",
      triangleQ, Some(triangleOracle)),
    QueryDef("connected_components",
      "min-label-propagation connected components, unrolled-CTE oracle",
      connectedComponentsQ, Some(ccOracle)))
}
