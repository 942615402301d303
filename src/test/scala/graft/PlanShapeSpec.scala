package graft

/** Scale-posture assertions on the REGISTERED query plans (not spec-only
  * variants): the two round-2 "weak at scale" queries must never regress
  * back to quadratic shapes.
  */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(name: String): String =
    graft.queries.Registry.byName(name).run(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("neardup_embedding: no nested-loop/cartesian join anywhere") {
    val plan = executedPlan("neardup_embedding")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("sim_topk_ivf: assignment is a projection; the only join is keyed") {
    val plan = executedPlan("sim_topk_ivf")
    // the codebook is collected (C rows) and inlined, so assignment has
    // no join at all; posting-list probing is a keyed hash join
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("ivf centroid selection compiles to bounded top-C, not a global sort") {
    import org.apache.spark.sql.functions._
    val e = graft.model.Tables.load(spark, sfDir, "embeddings")
    val sel = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(32)
    assert(sel.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("custkey_deciles: no single-partition global window") {
    val plan = executedPlan("custkey_deciles")
    assert(!plan.contains("Window ["), plan.take(2000))
  }

  test("trailing_revenue_7d: a keyed RANGE-frame window, one exchange " +
      "on the partition key, no joins") {
    val plan = executedPlan("trailing_revenue_7d")
    // time-range frame survives into the physical window spec
    assert(plan.contains("specifiedwindowframe(RangeFrame"), plan.take(2000))
    // partitioned by customer — never an empty-PARTITION-BY global window
    assert("windowspecdefinition\\(o_custkey".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges")
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("asof_clicks_bucketed: carry-forward window clusters on " +
      "(key, bucket), never key alone") {
    val plan = executedPlan("asof_clicks_bucketed")
    assert(
      "windowspecdefinition\\(user_id[^,]*, __bkt".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("windowspecdefinition"))
        .mkString("\n").take(2000))
  }
}
