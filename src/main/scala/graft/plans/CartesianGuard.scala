package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Analysis-time seatbelt against silently-quadratic joins.
  *
  * The classic 100 TB incident: a join predicate that LOOKS keyed but
  * contains no cross-side equality (a typo'd `a.id === a.id`, a pure
  * range condition, a missing ON clause) plans as CartesianProduct /
  * BroadcastNestedLoopJoin, runs fine on the laptop sample, and melts
  * the cluster at scale. PlanAuditSpec catches this for the queries in
  * the repo; this rule is the ENGINE-level guard for user queries:
  * injected via [[graft.functions.GraftExtensions]], it fails analysis
  * when a join has no cross-side equi-predicate and BOTH inputs exceed
  * a size threshold — bounded-by-construction sides (dimension seeds,
  * plane indices, scalar subqueries) pass untouched, which is exactly
  * the policy the repo's own allowlist encodes.
  *
  * Because check rules run BEFORE predicate pushdown, the key for a
  * SQL comma-join (`FROM a, b WHERE a.id = b.id`) or a
  * `crossJoin(...).filter(a === b)` still sits in a [[Filter]] ABOVE
  * the condition-less [[Join]] at this stage — Spark's own
  * CheckCartesianProducts runs post-pushdown for exactly this reason.
  * This guard therefore carries Filter conjuncts down to the join they
  * gate and counts a cross-side equality found there as the join's
  * key. Explicitly-requested `Cross` joins are exempt, matching
  * Spark's own policy (`crossJoin` / `CROSS JOIN` is the user saying
  * "yes, really"); the guard targets the ACCIDENTAL product — an
  * inner join that merely lost its key.
  *
  * Conservative by design: it never alters a plan (check rule, not
  * optimizer rule), and it only fires on statistically LARGE×LARGE
  * unkeyed joins. Opt out per session with
  * `spark.graft.guard.cartesian=false`, or raise the bound with
  * `spark.graft.guard.cartesian.maxBytes`.
  */
class CartesianGuard(spark: SparkSession) extends (LogicalPlan => Unit) {

  private def conf(key: String, dflt: String): String =
    spark.conf.getOption(key).getOrElse(dflt)

  /** Flatten an AND tree into conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Does any conjunct — from the join's own condition or a Filter
    * above it — equate an attribute from one side with one from the
    * other? (The condition Spark needs to plan a hash/merge join once
    * pushdown has run.) */
  private def hasCrossSideEquality(j: Join,
      inherited: Seq[Expression]): Boolean =
    (j.condition.toSeq.flatMap(conjuncts) ++ inherited).exists {
      case EqualTo(l, r)       => splitsSides(j, l, r)
      case EqualNullSafe(l, r) => splitsSides(j, l, r)
      case _                   => false
    }

  private def splitsSides(j: Join, l: Expression, r: Expression): Boolean = {
    val (ls, rs) = (j.left.outputSet, j.right.outputSet)
    (l.references.nonEmpty && r.references.nonEmpty) &&
      ((l.references.subsetOf(ls) && r.references.subsetOf(rs)) ||
        (l.references.subsetOf(rs) && r.references.subsetOf(ls)))
  }

  /** Walk the tree carrying the conjuncts of any Filter chain directly
    * above each Join (those are the predicates pushdown would turn
    * into the join condition). Everything else resets the carry. */
  private def check(plan: LogicalPlan, inherited: Seq[Expression],
      maxBytes: Long): Unit = plan match {
    case f: Filter =>
      check(f.child, inherited ++ conjuncts(f.condition), maxBytes)
    case j: Join =>
      if (j.joinType != Cross && !hasCrossSideEquality(j, inherited)) {
        val (lb, rb) = (j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
        if (lb > maxBytes && rb > maxBytes) {
          throw new SparkException(
            s"[graft] unkeyed ${j.joinType} join between two large " +
              s"relations (left=$lb bytes, right=$rb bytes, " +
              s"bound=$maxBytes): this plans as a cartesian/nested-loop " +
              "product and will not survive scale. Add a cross-side " +
              "equality key, use an explicit crossJoin if the product " +
              "is intended, reduce one side below " +
              "spark.graft.guard.cartesian.maxBytes, or disable " +
              "spark.graft.guard.cartesian for this session.")
        }
      }
      check(j.left, Nil, maxBytes)
      check(j.right, Nil, maxBytes)
    case other =>
      other.children.foreach(check(_, Nil, maxBytes))
  }

  override def apply(plan: LogicalPlan): Unit = {
    if (!conf("spark.graft.guard.cartesian", "true").toBoolean) return
    val maxBytes =
      conf("spark.graft.guard.cartesian.maxBytes", (64L << 20).toString)
        .toLong
    check(plan, Nil, maxBytes)
  }
}
