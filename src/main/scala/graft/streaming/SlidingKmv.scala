package graft.streaming

import java.sql.Date

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-day KMV (bottom-k) distinct sketch: the continuous
  * half of the x91 sliding-distinct story. Each day's state is the
  * bottom-[[K]] set of multiplicative-hashed user ids — O(k) longs per
  * day regardless of traffic, the mergeable summary a 100 TB deploy
  * checkpoints so ANY trailing window's distinct count is served by
  * merging stored day sketches (bottom-k of unioned bottom-ks IS the
  * window's true bottom-k — x91's monotonicity argument) instead of
  * re-scanning events.
  *
  * The fold is pure set arithmetic on deterministic integer hashes, so
  * stream state is bit-identical to the batch-computed daily sketch
  * (st11's card, DuckDB-gated) no matter how events are batched —
  * SlidingKmvSpec pins stream ≡ batch on the real events table and the
  * fold's idempotence (re-delivered events cannot move the sketch,
  * because a set union absorbs duplicates — effectively-once comes
  * free, no high-water mark needed unlike Changepoint's prefix sum).
  *
  * Deployment note: state grows one entry per DAY (≤ k longs each); a
  * retention-bounded run evicts days behind the watermark with an
  * event-time timeout once their sketch is persisted downstream —
  * eviction never changes emitted values, it only caps the store.
  */
object SlidingKmv {

  val K = 128
  val M = 1000000007L

  final case class UserDay(day: Date, user_id: Long)
  final case class SketchState(hs: Array[Long])
  final case class DaySketch(day: Date, k_used: Long, kth_h: Long,
      est: Long)

  /** The oracle-portable hash x91 uses: (a·uid + b) mod p. */
  def hash(uid: Long): Long = (2654435761L * (uid % M) + 12345L) % M

  /** Estimate |distinct| from a bottom-k sketch: exact below k (the
    * sketch IS the distinct hash set), (k−1)·M / h_(k) at k. */
  def estimate(kUsed: Long, kth: Long): Long =
    if (kUsed < K) kUsed else ((K - 1).toLong * M) / kth

  /** Fold a day's new events into its bottom-k state; emit the updated
    * sketch summary. Pure — unit-testable without a streaming query. */
  def step(day: Date, rows: Iterator[UserDay],
      state: GroupState[SketchState]): Iterator[DaySketch] = {
    val prev = state.getOption.map(_.hs.toSet).getOrElse(Set.empty[Long])
    val merged = (prev ++ rows.map(r => hash(r.user_id)))
      .toArray.sorted.take(K)
    state.update(SketchState(merged))
    val kUsed = merged.length.toLong
    val kth = if (merged.nonEmpty) merged.last else -1L
    Iterator.single(DaySketch(day, kUsed, kth, estimate(kUsed, kth)))
  }

  /** Apply the sketch fold to a (possibly streaming) per-event
    * Dataset. */
  def monitor(events: Dataset[UserDay]): Dataset[DaySketch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
  }
}
