package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct
import graft.plans.AsOfStrategy

/** Session-extension entry point — the standard deployment hook for
  * graft's custom Catalyst pieces:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * wires, at session build time and with no code changes in the user's
  * job:
  *   - `graft_dot(a, b)` — the codegen [[DotProduct]] expression — into
  *     the SQL function registry (usable from `spark.sql`, views, and
  *     the Column API via `expr`);
  *   - [[AsOfStrategy]] into the planner, so [[graft.plans.AsOf]]
  *     logical nodes plan without the per-session registration
  *     `AsOf.asofJoin` otherwise performs.
  *
  * [[GraftExtensions.registerAll]] is the same wiring for an ALREADY
  * RUNNING session (notebooks, tests) — idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectPlannerStrategy(_ => AsOfStrategy)
  }
}

object GraftExtensions {

  private[graft] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot",
        "graft_dot(a, b) - dot product of two float/double arrays " +
          "(codegen; folds the shorter length, null elements null " +
          "the result)"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      })

  /** Idempotently add the same wiring to a live session. */
  def registerAll(spark: SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id))
      reg.registerFunction(id, info, builder)
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }
}
