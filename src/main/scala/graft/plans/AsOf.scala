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

  /** As-of join through the native operator: left rows + nearest right
    * row's `carryCols` per key, null-extended, as columns `asof_<name>`.
    * `direction` and `toleranceSeconds` mirror
    * [[graft.extra.TimeSeries.asofJoin]] (pandas merge_asof parity):
    * forward runs the SAME backward exec on negated epoch time (order
    * reversal — no second physical operator needed), tolerance rides the
    * matched right timestamp as a synthetic carry and nulls stale
    * matches in a post-projection.
    */
  def join(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      carryCols: Seq[String], prefix: String = "asof_",
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    import org.apache.spark.sql.functions.{col, when}
    val fwd = direction == "forward"
    val withTol = toleranceSeconds.isDefined
    if (!fwd && !withTol) return joinRaw(left, right, key, tsCol, carryCols, prefix)
    val negts = "__graft_negts"
    val rts = "__graft_rts"
    val l2 = if (fwd) left.withColumn(negts, -col(tsCol).cast("double")) else left
    val r2 = {
      val a = if (withTol) right.withColumn(rts, col(tsCol)) else right
      if (fwd) a.withColumn(negts, -col(tsCol).cast("double")) else a
    }
    val joined = joinRaw(l2, r2, key, if (fwd) negts else tsCol,
      carryCols ++ (if (withTol) Seq(rts) else Nil), prefix)
    val base = if (fwd) joined.drop(negts) else joined
    toleranceSeconds match {
      case None => base
      case Some(tol) =>
        val gap =
          if (fwd) col(prefix + rts).cast("double") - col(tsCol).cast("double")
          else col(tsCol).cast("double") - col(prefix + rts).cast("double")
        carryCols.foldLeft(base)((df, c) =>
          df.withColumn(prefix + c, when(gap <= tol.toDouble, col(prefix + c))))
          .drop(prefix + rts)
    }
  }

  private def joinRaw(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, carryCols: Seq[String], prefix: String): DataFrame = {
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
