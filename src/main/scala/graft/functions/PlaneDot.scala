package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native signed projection of an embedding onto deterministic
  * hyperplane `p` — the sign-LSH bucketing kernel shared by
  * x05b/x10/x33/x55/w06 ([[graft.queries.DedupSim]] `planeDot`):
  *
  *   Σ_i  s(i, p) · emb[i],   s(i, p) = +1 iff
  *   ((i·37 + p·101 + i·p·13) % 97) % 2 = 0,  i 1-based
  *
  * Purpose-built replacement for the SQL-lambda form
  * `aggregate(transform(sequence(1, n), i -> CASE ...), 0.0,
  * (a, v) -> a + v)`: higher-order array functions stay OUTSIDE
  * whole-stage codegen and allocate an index array plus a signed copy
  * per (row, plane) — and the bucket build evaluates this once per
  * row×plane, so it dominates the index-construction stage of every
  * sign-LSH query. This emits one fused loop instead.
  *
  * Accumulation is ascending-i in doubles, exactly like the lambda
  * form and the DuckDB oracle's list_reduce — bit-identical results,
  * so no oracle SQL changes. The i·p cross term keeps plane sign
  * patterns aperiodic in p (see the planeDot scaladoc in DedupSim;
  * AnnScalingSpec guards the bucket-space consequence).
  */
case class PlaneDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[Number].longValue()
    if (isFloat) PlaneDot.computeF(arr, p) else PlaneDot.computeD(arr, p)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val kernel = if (isFloat) "computeF" else "computeD"
    defineCodeGen(ctx, ev,
      (a, p) => s"graft.functions.PlaneDot.$kernel($a, (long)($p))")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PlaneDot = copy(left = l, right = r)
}

object PlaneDot {

  /** +v iff ((i·37 + p·101 + i·p·13) % 97) % 2 = 0 — the sign rule of
    * the SQL fragment, i 1-based. */
  private def signed(i: Long, p: Long, v: Double): Double =
    if (((i * 37 + p * 101 + i * p * 13) % 97) % 2 == 0) v else -v

  def computeF(a: ArrayData, p: Long): Double = {
    val n = a.numElements()
    var acc = 0.0
    var j = 0
    while (j < n) {
      acc += signed(j + 1, p, a.getFloat(j).toDouble)
      j += 1
    }
    acc
  }

  def computeD(a: ArrayData, p: Long): Double = {
    val n = a.numElements()
    var acc = 0.0
    var j = 0
    while (j < n) {
      acc += signed(j + 1, p, a.getDouble(j))
      j += 1
    }
    acc
  }

  def apply(emb: Column, p: Column): Column =
    Bridge.column(new PlaneDot(Bridge.expression(emb),
      Bridge.expression(p)))
}
