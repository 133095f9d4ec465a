package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Access bridge for `private[sql]` surfaces that Spark 4 extension
  * libraries need: wrapping a Catalyst Expression as a user-facing
  * Column, wrapping a LogicalPlan as a DataFrame, and registering a
  * planner strategy on a live session. (The standard pattern for
  * third-party expression/operator libraries — the classic
  * Column(expr) / Dataset.ofRows constructors went away with Spark
  * Connect.)
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) LogicalPlan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The materialized RDD backing a Dataset returned by
    * `checkpoint()`/`localCheckpoint()` (analyzed plan = LogicalRDD),
    * if any — lets callers release superseded checkpoint storage. */
  def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Register a planner strategy on a live session (idempotent). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.exists(_.getClass == s.getClass))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ s
  }
}
