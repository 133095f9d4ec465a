package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL-surface registration for the graft native expressions:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT poly_hash(text), simhash64(split(text, ' ')) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(args.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(args.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args.head, args(1))))
    // analysis-time refusal of large×large unkeyed joins (see
    // CartesianGuard scaladoc for the policy and opt-outs)
    e.injectCheckRule(session => new graft.plans.CartesianGuard(session))
    // plans the native as-of join (plans.AsofJoin → AsofJoinExec);
    // Asof.nativeJoin also self-registers on sessions without extensions
    e.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
  }
}
