package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash: fold over the string's code points,
  * `acc = (acc * 31 + cp) % 1_000_000_007`.
  *
  * Purpose-built replacement for the SQL-lambda formulation
  * `aggregate(transform(split(s, ''), ascii), ...)` used by the
  * fingerprint / MinHash operators: identical values (so the DuckDB
  * oracle still matches bit-for-bit), but one tight loop per row instead
  * of three array allocations per character — this is the 100 TB hot
  * path. Codegen emits a single static call; no boxing.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash.compute($c)")

  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = computeStr(s.toString)

  /** The fold itself, on a JVM string — shared with [[MinHashSigs]],
    * whose kernel hashes shingles it assembles in-loop. */
  def computeStr(str: String): Long = {
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def apply(c: Column): Column =
    Bridge.column(new PolyHash(Bridge.expression(c)))
}
