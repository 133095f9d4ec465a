package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the streaming twin of the batch q56
  * query: per user, a 3-state machine (view → click → purchase, each
  * step within a bounded window of the previous) folded incrementally
  * over the event stream, state O(1) per user.
  *
  * Semantics are EXACTLY q56's first-match form: the anchor is the
  * user's FIRST view; the click step completes at the first click
  * strictly after the anchor within the window; the purchase step at
  * the first purchase strictly after that click within the window.
  * Because each step key is a MINIMUM over event time, the fold is
  * order-insensitive WITHIN a micro-batch (rows are sorted before
  * folding) but requires non-decreasing event time ACROSS batches for
  * exact parity (the st05/Changepoint/NearDupStream discipline) — a
  * later batch cannot retroactively lower a minimum that already
  * advanced the machine. FunnelStreamSpec pins stream ≡ batch on the
  * per-user step times against the same relations q56 aggregates.
  *
  * State lifecycle: a completed (purchased) user's state is frozen —
  * no further event can change it — and an incomplete user's windows
  * lapse once event time passes anchor + 2·window, so the state is
  * evictable behind a watermark at that horizon (eviction left to the
  * deployment's timeout policy; the state itself is three longs).
  */
object FunnelStream {

  /** One event with its time already in exact epoch µs (converted
    * relationally via unix_micros, the q56 contract). */
  final case class Ev(user_id: Long, event_type: String, us: Long)
  /** State-layout version. Bump on ANY [[FunnelState]] shape or
    * semantics change; restore under a mismatched tag throws. */
  val StateVer = 2 // v1 = untagged r8 layout

  /** Step times in epoch µs; -1 = step not reached. */
  final case class FunnelState(ver: Int, t0: Long, t1: Long, t2: Long)
  final case class UserFunnel(user_id: Long, t0: Long, t1: Long,
      t2: Long)

  val WindowUs: Long = 86400000000L // 24 h, q56's window

  /** Fold new events into the user's funnel state. Pure. */
  def step(windowUs: Long)(userId: Long, rows: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[UserFunnel] = {
    state.getOption.foreach(x => require(x.ver == StateVer,
      s"FunnelStream state version ${x.ver} != $StateVer — restart " +
        "from a fresh checkpoint and re-seed via the batch twin q56"))
    var s = state.getOption.getOrElse(FunnelState(StateVer, -1L, -1L, -1L))
    // event-time order within the batch: minima advance correctly
    rows.toSeq.sortBy(_.us).foreach { r =>
      val us = r.us
      r.event_type match {
        case "view" if s.t0 < 0 => s = s.copy(t0 = us)
        case "click" if s.t0 >= 0 && s.t1 < 0 && us > s.t0 &&
          us <= s.t0 + windowUs => s = s.copy(t1 = us)
        case "purchase" if s.t1 >= 0 && s.t2 < 0 && us > s.t1 &&
          us <= s.t1 + windowUs => s = s.copy(t2 = us)
        case _ => ()
      }
    }
    state.update(s)
    Iterator.single(UserFunnel(userId, s.t0, s.t1, s.t2))
  }

  /** Apply the funnel machine to a (possibly streaming) event frame
    * with columns (user_id, event_type, ts). Update-mode output: the
    * latest funnel snapshot per user seen so far. */
  def track(events: DataFrame, windowUs: Long = WindowUs)
      : Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: Long, rows: Iterator[Ev], st: GroupState[FunnelState]) =>
          step(windowUs)(k, rows, st).next())
  }
}
