package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

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

  /** Does any conjunct equate an attribute from one side with one from
    * the other? (The condition Spark needs to plan a hash/merge join.) */
  private def hasCrossSideEquality(j: Join): Boolean =
    j.condition.exists(conjuncts(_).exists {
      case EqualTo(l, r)       => splitsSides(j, l, r)
      case EqualNullSafe(l, r) => splitsSides(j, l, r)
      case _                   => false
    })

  private def splitsSides(j: Join, l: Expression, r: Expression): Boolean = {
    val (ls, rs) = (j.left.outputSet, j.right.outputSet)
    (l.references.nonEmpty && r.references.nonEmpty) &&
      ((l.references.subsetOf(ls) && r.references.subsetOf(rs)) ||
        (l.references.subsetOf(rs) && r.references.subsetOf(ls)))
  }

  override def apply(plan: LogicalPlan): Unit = {
    if (!conf("spark.graft.guard.cartesian", "true").toBoolean) return
    val maxBytes =
      conf("spark.graft.guard.cartesian.maxBytes", (64L << 20).toString)
        .toLong
    plan.foreach {
      case j: Join if !hasCrossSideEquality(j) =>
        val (lb, rb) = (j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
        if (lb > maxBytes && rb > maxBytes) {
          throw new SparkException(
            s"[graft] unkeyed ${j.joinType} join between two large " +
              s"relations (left=$lb bytes, right=$rb bytes, " +
              s"bound=$maxBytes): this plans as a cartesian/nested-loop " +
              "product and will not survive scale. Add a cross-side " +
              "equality key, reduce one side below " +
              "spark.graft.guard.cartesian.maxBytes, or disable " +
              "spark.graft.guard.cartesian for this session.")
        }
      case _ =>
    }
  }
}
