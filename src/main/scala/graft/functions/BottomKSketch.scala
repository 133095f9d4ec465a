package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k sketch aggregator: keeps the k smallest hash values seen in
  * a group. Two groups' Jaccard similarity is estimated from their
  * sketches (|bottomK(A∪B) ∩ A's ∩ B's| / k) — the classic KMV /
  * bottom-k MinHash estimator, O(k) state per group regardless of group
  * size.
  *
  * This is the custom-aggregate extension path
  * (`org.apache.spark.sql.expressions.Aggregator`): usable as a typed
  * TypedColumn via `.toColumn` or registered with
  * `spark.udf.register("bottom_k", udaf(new BottomKSketch(k)))`.
  * At 100 TB: the sketch shuffles k longs per group instead of the
  * full distinct element set.
  */
class BottomKSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  // buffer: sorted ascending, at most k values, no duplicates
  override def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, v)
    if (idx >= 0) buf // duplicate
    else {
      val ins = -idx - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    insert(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BottomKSketch {
  /** KMV Jaccard estimate from two bottom-k sketches. */
  def estimateJaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val union = (a ++ b).distinct.sorted.take(k)
    val sa = a.toSet
    val sb = b.toSet
    val inBoth = union.count(v => sa.contains(v) && sb.contains(v))
    inBoth.toDouble / union.length.toDouble
  }
}
