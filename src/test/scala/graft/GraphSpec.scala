package graft

import graft.extra.Graph

/** Hand-checked PageRank behavior (the oracle gate replays the exact
  * 10-iteration recurrence at corpus scale; these pin the math on
  * graphs small enough to verify by eye).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle: perfect symmetry keeps both ranks at 1/2") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = Graph.pagerank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    assert(out("a") == 0.5 && out("b") == 0.5)
  }

  test("ranks sum to ~1 on a graph with no dangling nodes") {
    // 4-node directed ring plus a chord — every node has out-degree
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c")).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, "src", "dst", iters = 10)
      .collect().map(_.getAs[Double]("rank"))
    assert(math.abs(ranks.sum - 1.0) < 1e-9)
  }

  test("a node every other node points at outranks the others") {
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"),
      ("hub", "a")).toDF("src", "dst")
    // the a↔hub 2-cycle oscillates with period 2, so run the fixed
    // recurrence long enough to be near the fixed point
    val out = Graph.pagerank(edges, "src", "dst", iters = 60)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    assert(out("hub") > out("a"))
    assert(out("a") > out("b")) // a also receives the hub's whole mass
    assert(out("b") == out("c")) // symmetric leaves tie exactly
  }

  test("result is invariant to input partitioning (integer fixed-point)") {
    val edges = (1 to 50).flatMap(i =>
      Seq((s"n$i", s"n${i % 7}"), (s"n${i % 7}", s"n$i")))
      .toDF("src", "dst")
    val once = Graph.pagerank(edges, "src", "dst").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    val again = Graph.pagerank(edges.repartition(13), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    assert(once == again)
  }

  test("empty edge frame fails fast with a clear message, not a " +
      "divide-by-zero") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pagerank(empty, "src", "dst")
    }
    assert(e.getMessage.contains("non-empty"))
  }
}
