package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005) as a typed Spark `Aggregator`.
  *
  * Keeps at most `capacity` (item → (count, overestimate-error)) slots.
  * When a new item arrives on a full sketch it evicts the current
  * minimum and inherits its count as error — the classic guarantee:
  * every item with true frequency > N/capacity is retained, and each
  * reported count overestimates the true one by at most its recorded
  * error.
  *
  * This is the 100 TB path for exact heavy hitters (`x22_heavy_hitters`):
  * the exact query hash-aggregates the full token domain — fine while
  * the vocabulary fits executor memory, unbounded when it doesn't. The
  * sketch shuffles a FIXED `capacity` slots per partition regardless of
  * domain size, and merged sketches (pairwise count addition + re-prune)
  * preserve the error bound. Use `capacity ≥ k / ε` for top-k with
  * tolerance ε; the spec asserts sketch-top-k == exact-top-k on skewed
  * data at `capacity = 8k`.
  *
  * Usage: `ds.select(new SpaceSavingTopK(1024, 20).toColumn)` or
  * `spark.udf.register("topk_sketch", udaf(new SpaceSavingTopK(1024, 20)))`.
  */
class SpaceSavingTopK(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, (Long, Long)],
      Array[(String, Long, Long)]] {
  require(capacity >= k, "capacity must be >= k")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)],
                      item: String): Map[String, (Long, Long)] =
    buf.get(item) match {
      case Some((c, e)) => buf.updated(item, (c + 1L, e))
      case None if buf.size < capacity => buf.updated(item, (1L, 0L))
      case None =>
        // evict the minimum-count slot; the newcomer inherits its count
        // (the SpaceSaving overestimate) and records it as error
        val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
        (buf - minItem).updated(item, (minC + 1L, minC))
    }

  /** Merge = add counts/errors for shared items, union the rest, then
    * keep the `capacity` largest — the standard mergeable-summaries
    * formulation (Agarwal et al., PODS 2012): the error bound degrades
    * additively, never breaks. */
  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)])
      : Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = mutable.Map.from(a)
    b.foreach { case (item, (c, e)) =>
      m.get(item) match {
        case Some((c0, e0)) => m.update(item, (c0 + c, e0 + e))
        case None           => m.update(item, (c, e))
      }
    }
    if (m.size <= capacity) m.toMap
    else {
      // prune to capacity: dropped slots' counts become error mass that
      // surviving guarantees already absorb (their counts are larger)
      m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity).toMap
    }
  }

  /** Top-k by (count desc, item asc) — same tie-break as the exact
    * query. Returns (item, count, error): callers can check
    * `count - error` for the guaranteed-frequency lower bound. */
  override def finish(buf: Map[String, (Long, Long)])
      : Array[(String, Long, Long)] =
    buf.toArray
      .map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }
      .take(k)

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Array[(String, Long, Long)]] =
    ExpressionEncoder[Array[(String, Long, Long)]]()
}
