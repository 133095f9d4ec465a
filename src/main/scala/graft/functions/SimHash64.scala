package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array: each token is FNV-1a
  * hashed, each of the 64 bit positions accumulates ±1 across tokens,
  * and the output bit is 1 where the accumulator is positive.
  *
  * This is the scale-path near-duplicate fingerprint (one long per
  * document; Hamming distance ≤ k ⇒ near-dup). The 16-bit
  * mod-arithmetic variant in the x03 query is the DuckDB-checkable
  * formulation; this expression is the production kernel (tested for
  * self-consistency and Hamming behavior in SimHashSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two simhashes (for join predicates). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def apply(c: Column): Column =
    Bridge.column(new SimHash64(Bridge.expression(c)))
}
