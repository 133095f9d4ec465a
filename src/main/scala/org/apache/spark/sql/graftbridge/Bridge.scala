package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` surfaces that Spark 4 extension
  * libraries need: wrapping a Catalyst Expression as a user-facing
  * Column. (The standard pattern for third-party expression libraries —
  * the classic Column(expr) constructor went away with Spark Connect.)
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
