package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row inside a top-k buffer. */
final case class Scored(value: Double, id: Long)

/** Bounded-heap top-k-per-key aggregator — the scale path for the
  * `row_number() OVER (PARTITION BY key ORDER BY ...) <= k` pattern.
  *
  * The window formulation shuffles EVERY row to its key's partition and
  * sorts there; this aggregator prunes map-side: each input partition
  * keeps at most k rows per key in its hash-aggregate buffer, so the
  * exchange carries ≤ k×keys×partitions rows no matter how large the
  * fact table is. Ordering is total (value desc, id asc), so the
  * result — and the oracle comparison — is deterministic.
  *
  * Buffer is a sorted array truncated at k: `merge` is associative and
  * commutative over it (both sides already ≤ k), which is what makes
  * the partial/final aggregation split correct under any partitioning.
  */
class TopKPerKey(k: Int)
    extends Aggregator[Scored, Array[Scored], Array[Scored]] {

  override def zero: Array[Scored] = Array.empty

  private def beats(a: Scored, b: Scored): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  private def insert(buf: Array[Scored], e: Scored): Array[Scored] = {
    if (buf.length == k && !beats(e, buf(k - 1))) return buf
    var ins = buf.indexWhere(beats(e, _))
    if (ins < 0) ins = buf.length
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[Scored](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = e
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def reduce(buf: Array[Scored], e: Scored): Array[Scored] =
    insert(buf, e)

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Scored]): Array[Scored] = buf

  override def bufferEncoder: Encoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
}
