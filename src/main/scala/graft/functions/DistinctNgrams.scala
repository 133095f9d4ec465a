package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native distinct word-n-gram counter over a token array.
  *
  * Replacement for the SQL-lambda formulation
  * `size(array_distinct(transform(sequence(0, size(words) - n), i ->
  * concat_ws(' ', words[i], ...))))` used by the repetition-score
  * operator (TextOps x16): the lambda chain materializes three
  * intermediate arrays per row and stays outside whole-stage codegen,
  * while this is one pass with a hash set. Values are identical — the
  * n-grams are the same space-joined strings, counted exactly — so the
  * DuckDB oracle is unchanged.
  */
case class DistinctNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    DistinctNgrams.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DistinctNgrams.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): DistinctNgrams =
    copy(child = c)
}

object DistinctNgrams {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(words: ArrayData, n: Int): Int = {
    val len = words.numElements()
    if (len < n) 0
    else {
      val seen = new java.util.HashSet[String](math.max(16, len * 2))
      var i = 0
      while (i <= len - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words.getUTF8String(i + j).toString)
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      seen.size
    }
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(new DistinctNgrams(Bridge.expression(c), n))
}
