package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator custom-Catalyst path
  * (SURVEY.md §4.4): logical node + planner strategy + sort-merge
  * physical operator, registered via `spark.experimental.extraStrategies`.
  *
  * Semantics (identical to [[graft.extra.TimeSeries.asofJoin]], which is
  * the composed-builtins form): for every left row, attach the columns
  * of the LATEST right row with the same key and right.ts <= left.ts
  * (ties count as prior); null-extended when no such row exists.
  *
  * Physical execution: both sides hash-clustered on the key and sorted
  * by (key, ts) — EnsureRequirements inserts the exchanges/sorts — then
  * a single streaming merge pass per partition with O(1) state (the last
  * matching right row). This is the plan shape a dedicated market-data
  * engine uses: one shuffle each side, no windowed buffering, no
  * range-join blowup.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    asofOutput: Seq[AttributeReference])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carried, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, carried, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    asofOutput: Seq[AttributeReference])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val carriedIdx = carried.map(a => right.output.indexWhere(_.exprId == a.exprId))
    val numCarried = asofOutput.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuffered = rIter.buffered
      val nullRow = InternalRow.fromSeq(Seq.fill(numCarried)(null))
      val carryProj = UnsafeProjection.create(
        carried.map(a => BindReferences.bindReference(a: Expression, right.output)))
      val outProj = UnsafeProjection.create(output, left.output ++ asofOutput)
      val joined = new JoinedRow
      // O(1) merge state: the latest right row (projected to the carried
      // columns) whose (key, ts) <= current left (key, ts).
      var curKey: Any = null
      var curCarry: InternalRow = null

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow)
        // Null keys or a null left ts never match (same as the window
        // formulation, where comparisons against null are never true) —
        // timeOrd/keyOrd are null-intolerant, so guard before comparing.
        var advancing = lk != null && lt != null
        while (advancing && rBuffered.hasNext) {
          val head = rBuffered.head
          val rk = rKey.eval(head)
          if (rk == null) { rBuffered.next() } // null keys never match
          else {
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) {
              rBuffered.next() // right key behind left: discard
            } else if (kc == 0) {
              val rt = rTime.eval(head)
              if (rt == null) { rBuffered.next() } // null right ts never matches
              else if (timeOrd.compare(rt, lt) <= 0) {
                curKey = rk
                curCarry = carryProj(head).copy()
                rBuffered.next()
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
        }
        val matched = curCarry != null && lk != null && lt != null &&
          keyOrd.compare(curKey, lk) == 0
        outProj(joined(lRow, if (matched) curCarry else nullRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
