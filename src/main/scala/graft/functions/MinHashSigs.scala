package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native row-local MinHash signature kernel: the 16 slot minima of
  * `(A(j)·PolyHash(shingle) + B(j)) % P` over a document's word-3-gram
  * shingles, in ONE fused loop per row.
  *
  * Purpose-built replacement for the relational formulation in
  * [[graft.etl.NearDup.signatures]] (explode distinct shingles →
  * PolyHash → groupBy(doc_id) with 16 min-aggregates): identical
  * values — min over the shingle multiset equals min over the distinct
  * set, the split/concat_ws(' ')/hash semantics are replicated
  * byte-for-byte (regex-free space split with limit −1 keeps empty
  * words exactly like Spark's `split(text, ' ')`) — so the DuckDB
  * oracles of every consumer (x02/x56/w05/w06) still match
  * bit-for-bit. What changes is the plan: the signature stage needs no
  * explode, no shuffle, and no aggregation state — it is a projection
  * inside whole-stage codegen, and the first exchange a near-dup
  * funnel pays is the banded-candidate join itself. At 100 TB that
  * removes the widest intermediate of the whole family (the exploded
  * (doc_id, h) relation) from the plan entirely.
  *
  * Contract: input ≥ 3 words (the caller filters, exactly as the
  * relational path did). A shorter input has zero shingles and yields
  * the empty-min identity (all slots Long.MaxValue) — mathematically
  * honest and impossible to mistake for a real signature.
  *
  * The permutation family is [[graft.etl.NearDup.A]]/[[graft.etl.NearDup.B]]
  * verbatim — one source of truth, so the x51 error audit (which stays
  * on the shared shingle-hash relation) can never drift from this
  * kernel's family.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashSigs.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigs.compute($c)")

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

object MinHashSigs {
  private val A: Array[Long] = graft.etl.NearDup.A.toArray
  private val B: Array[Long] = graft.etl.NearDup.B.toArray
  private val P: Long = graft.etl.NearDup.P
  private val K: Int = A.length

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    // limit -1 keeps trailing/leading empty words — Spark split parity
    val words = s.toString.split(" ", -1)
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    val last = words.length - 3
    while (i <= last) {
      val h = PolyHash.computeStr(
        words(i) + " " + words(i + 1) + " " + words(i + 2))
      var j = 0
      while (j < K) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(c: Column): Column =
    Bridge.column(new MinHashSigs(Bridge.expression(c)))
}
