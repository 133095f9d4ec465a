package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two embedding arrays.
  *
  * Purpose-built replacement for the SQL-lambda formulation
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  * (acc, v) -> acc + v)` used by the KNN / ANN / embedding-dedup
  * operators (DedupSim x05/x05b/x10): higher-order array functions stay
  * OUTSIDE whole-stage codegen and allocate an intermediate array per
  * row — at 100 TB the similarity scan is the hot path, so this emits
  * one tight fused loop instead.
  *
  * Accumulation is left-to-right in doubles, exactly like the lambda
  * form and the DuckDB oracle's list_reduce — bit-identical results,
  * so the oracle SQL is unchanged. Arrays are assumed equal-length with
  * non-null elements (the embedding-table contract; extra trailing
  * elements on either side are ignored).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isFloat) DotProduct.computeF(x, y) else DotProduct.computeD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val kernel = if (isFloat) "computeF" else "computeD"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProduct.$kernel($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProduct = copy(left = l, right = r)
}

object DotProduct {

  /** Static kernels shared by interpreted eval and generated code; the
    * float variant widens each element exactly like CAST(x AS DOUBLE). */
  def computeF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def computeD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(new DotProduct(Bridge.expression(a),
      Bridge.expression(b)))
}
