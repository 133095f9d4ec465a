package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the custom-physical-operator tier of the
  * extension ladder (`LogicalPlan` + `SparkStrategy` + `SparkPlan`),
  * for the one join shape Spark has no built-in physical form for.
  *
  * `etl.Asof.join` expresses the same semantics by composition
  * (union + window carry-forward): correct and linear, but it pays for
  * generality — the union materializes a struct column per row, the
  * window runs a full carry state machine, and BOTH sides take the
  * union schema. This operator is the direct form: co-partition the
  * two sides on the key (one exchange each, exactly like a sort-merge
  * join), sort each by (key, time), then a single forward merge pass
  * per partition keeps the latest right row at-or-before each left
  * row. No union, no struct boxing, no window state — O(|L|+|R|)
  * per partition with two pointers.
  *
  * Semantics (pinned by the differential spec against Asof.join and
  * the j05/j11 DuckDB oracles): for each left row, attach the LAST
  * right row of the same key with rightTime <= leftTime; no such row →
  * right columns NULL. Ties on rightTime resolve to the right row
  * later in (key, time, input) sort order — callers needing total
  * determinism keep right unique per (key, time), same contract as
  * Asof.join. Left rows with NULL time match nothing; right rows with
  * NULL time are ignored.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long] = None)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsofJoin]] to [[AsofJoinExec]]. Registered via
  * `GraftExtensions` (injectPlannerStrategy) or
  * `spark.experimental.extraStrategies`. */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key — EnsureRequirements inserts the
  // two hash exchanges and aligns their partition counts, exactly as it
  // does for a sort-merge join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition sort by (key, time): the merge below is one forward
  // pass over each side
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output
    val tol = toleranceUs

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead on the right, with copied key (the
        // projection buffer is reused) and extracted time
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTime: Long = 0L
        // latest right row already passed whose key may equal the
        // current left key
        private var curMatch: InternalRow = _
        private var curMatchKey: UnsafeRow = _
        private var curMatchTime: Long = 0L

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val t = rTimeProj(r)
            if (!t.isNullAt(0)) { // null-time right rows are ignored
              rHeadTime = t.getLong(0)
              rHeadKey = rKeyProj(r).copy()
              rHead = r.copy()
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          // NULL left time matches nothing — tracked explicitly (not
          // via a sentinel) so a genuine Long.MinValue value in a
          // long-backed time column still matches normally
          val lTimeRow = lTimeProj(l)
          val lNull = lTimeRow.isNullAt(0)
          val lt = if (lNull) Long.MinValue else lTimeRow.getLong(0)
          var cmp = if (rHead == null) 1 else keyOrd.compare(rHeadKey, lk)
          while (rHead != null && (cmp < 0 || (cmp == 0 && rHeadTime <= lt))) {
            if (cmp == 0) {
              curMatch = rHead; curMatchKey = rHeadKey
              curMatchTime = rHeadTime
            }
            advanceRight()
            cmp = if (rHead == null) 1 else keyOrd.compare(rHeadKey, lk)
          }
          val m =
            if (!lNull && curMatch != null &&
                keyOrd.compare(curMatchKey, lk) == 0 &&
                tol.forall(t => lt - curMatchTime <= t))
              curMatch
            else nullRight
          toUnsafe(joined(l, m))
        }
      }
    }
  }
}
