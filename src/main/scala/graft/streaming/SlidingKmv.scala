package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, to_date}
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
  * State lifecycle: state grows one entry per DAY (≤ k longs each).
  * [[monitorEvents]] — the streaming deployment entry — bounds the
  * store with an event-time timeout: a day's state is evicted once the
  * watermark passes its end-of-day + [[RetentionDays]]. Eviction never
  * changes emitted values: a day-D row is admitted only while
  * watermark ≤ ts < D+1d, and the timeout fires only when watermark >
  * D + retention + 1d > D+1d — i.e. strictly after the last admissible
  * row for D, so a fired timeout removes state no future row can
  * reach (rows that late are dropped pre-operator in append mode).
  * [[monitor]] is the batch/test form of the same fold — a batch
  * GroupState has no watermark to time out against, so it uses
  * NoTimeout and keeps every day (bounded by the input's day span).
  *
  * State rows are VERSION-TAGGED ([[StateVer]]): a checkpoint written
  * under a different state layout fails loud at restore instead of
  * misdecoding (the r8 Changepoint schema break, generalized — the
  * repair path is a fresh checkpoint re-seeded from the batch st11
  * twin).
  */
object SlidingKmv {

  val K = 128
  val M = 1000000007L
  /** Multiplicative-hash constants, shared with the x91/st11 SQL
    * twins THROUGH these fields (interpolated, never re-hardcoded). */
  val HashA = 2654435761L
  val HashB = 12345L

  /** State-layout version. Bump on ANY [[SketchState]] shape or
    * semantics change; restore under a mismatched tag throws. */
  val StateVer = 2

  /** Days a day's sketch stays in the store past its own end before
    * the event-time timeout evicts it — covers every 28-day trailing
    * window consumer (x91) with a week of late-data grace. */
  val RetentionDays = 35

  final case class UserDay(day: Date, user_id: Long)
  /** Streaming carrier with the event time the watermark rides on. */
  final case class UserEvent(day: Date, ts: Timestamp, user_id: Long)
  final case class SketchState(ver: Int, hs: Array[Long])
  final case class DaySketch(day: Date, k_used: Long, kth_h: Long,
      est: Long)

  /** The oracle-portable hash x91 uses: (a·uid + b) mod p.
    * floorMod on both reductions so a NEGATIVE uid still lands in
    * [0, M) — Scala's % would emit a negative hash that sorts to the
    * front of the bottom-k and poisons kth_h/estimate. The SQL twins
    * mirror this with the same floored-mod identity. */
  def hash(uid: Long): Long =
    Math.floorMod(HashA * Math.floorMod(uid, M) + HashB, M)

  /** Estimate |distinct| from a bottom-k sketch: exact below k (the
    * sketch IS the distinct hash set), (k−1)·M / h_(k) at k. */
  def estimate(kUsed: Long, kth: Long): Long =
    if (kUsed < K) kUsed else ((K - 1).toLong * M) / kth

  /** Restore-or-fail-loud: state written under a different layout
    * version must not be silently misdecoded. */
  private def restored(state: GroupState[SketchState])
      : Option[SketchState] = {
    val s = state.getOption
    s.foreach(x => require(x.ver == StateVer,
      s"SlidingKmv state version ${x.ver} != $StateVer — restart from " +
        "a fresh checkpoint and re-seed via the batch st11 twin"))
    s
  }

  /** Fold a day's new events into its bottom-k state; emit the updated
    * sketch summary. Pure — unit-testable without a streaming query. */
  def step(day: Date, rows: Iterator[UserDay],
      state: GroupState[SketchState]): Iterator[DaySketch] = {
    val prev = restored(state).map(_.hs.toSet).getOrElse(Set.empty[Long])
    val merged = (prev ++ rows.map(r => hash(r.user_id)))
      .toArray.sorted.take(K)
    state.update(SketchState(StateVer, merged))
    val kUsed = merged.length.toLong
    val kth = if (merged.nonEmpty) merged.last else -1L
    Iterator.single(DaySketch(day, kUsed, kth, estimate(kUsed, kth)))
  }

  /** [[step]] plus the store-bounding timeout: evict a day once the
    * watermark passes its end-of-day + retention (see the state-
    * lifecycle contract above — a fired timeout can never change
    * emitted values). */
  def evictingStep(retentionDays: Int)(day: Date,
      rows: Iterator[UserEvent], state: GroupState[SketchState])
      : Iterator[DaySketch] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = step(day, rows.map(r => UserDay(r.day, r.user_id)), state)
    val hasWm =
      try { state.getCurrentWatermarkMs(); true }
      catch { case _: UnsupportedOperationException => false }
    if (hasWm) {
      // end of day D + retention; setTimeoutTimestamp must sit strictly
      // ahead of the current watermark (a late-but-admissible batch can
      // fold into a day the watermark already approached)
      val evictAt = day.getTime + (retentionDays.toLong + 1L) * 86400000L
      state.setTimeoutTimestamp(
        math.max(evictAt, state.getCurrentWatermarkMs() + 1L))
    }
    out
  }

  /** Batch/test form of the sketch fold — no event time, NoTimeout;
    * store bounded by the input's day span. Streaming deployments use
    * [[monitorEvents]] for the watermark-evicted store. */
  def monitor(events: Dataset[UserDay]): Dataset[DaySketch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (d: Date, rows: Iterator[UserDay], st: GroupState[SketchState])
          => step(d, rows, st))
  }

  /** Streaming deployment entry: the same fold over a (ts, user_id)
    * frame, watermarked at the retention horizon, with the event-time
    * timeout evicting days the watermark has passed — state rows ≤
    * retention-window days, emissions bit-identical to [[monitor]]
    * (SlidingKmvSpec pins both). On a batch frame the fold runs
    * timeout-free, identical to [[monitor]]. */
  def monitorEvents(events: DataFrame,
      retentionDays: Int = RetentionDays): Dataset[DaySketch] = {
    import events.sparkSession.implicits._
    val tagged = events.select(to_date(col("ts")).as("day"), col("ts"),
      col("user_id")).as[UserEvent]
    val wm = if (events.isStreaming)
      tagged.withWatermark("ts", s"$retentionDays days") else tagged
    val timeout = if (events.isStreaming)
      GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    wm.groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Update,
        timeout)(evictingStep(retentionDays))
  }
}
