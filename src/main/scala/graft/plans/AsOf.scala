package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference

/** User-facing API for the native as-of join operator.
  *
  * {{{
  * val joined = AsOf.join(trades, quotes, key = "symbol", tsCol = "ts",
  *   carryCols = Seq("bid", "ask"))   // adds asof_bid, asof_ask
  * }}}
  *
  * Registers [[AsOfStrategy]] on the session (idempotent) and builds the
  * [[AsOfJoinPlan]] logical node directly from the analyzed child plans.
  */
object AsOf {

  /** Idempotent strategy registration via experimental methods. */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }

  /** As-of join: left rows + latest (right.ts <= left.ts) right row's
    * `carryCols` per key, null-extended, as columns `asof_<name>`.
    */
  def join(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      carryCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join hygiene: if the two sides share attribute ids (both carved
    // from the same scan), re-alias the right side with fresh exprIds —
    // the analyzer's DeduplicateRelations only does this for builtin nodes
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rPlan0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${plan.output.map(_.name).mkString(",")}"))
    val carried = carryCols.map(c => attr(rPlan, c))
    val outAttrs = carried.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    GraftPlanBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, tsCol), attr(rPlan, tsCol),
        carried, outAttrs))
  }
}
