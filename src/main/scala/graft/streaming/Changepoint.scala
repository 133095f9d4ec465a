package graft.streaming

import java.sql.Date

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online CUSUM drift monitor over a stream of per-day volumes: the
  * streaming twin of the offline q52 changepoint query, in Page's
  * one-sided form. Per monitored key the state is FOUR integers (the
  * running prefix of deviations and its min/max, plus alarm tallies) —
  * O(1) regardless of stream length, the property that lets a
  * 1000-executor monitor watch every key of a 100 TB pipeline.
  *
  * Deviation math is exact ppm integers against a calibration
  * reference (`ref_ppm`, the expected daily volume × 10⁶) attached
  * upstream — the deploy shape is a broadcast-joined calibration
  * table, refreshed offline by q52's exact pass. Page's statistic is
  * computed by the prefix identity
  *   S⁺_k = P_k − min_{j≤k} P_j,   S⁻_k = max_{j≤k} P_j − P_k
  * (P = running sum of 10⁶·c − ref_ppm), which is what makes the
  * BATCH twin expressible as two plain window passes — the parity
  * ChangepointSpec pins. An alarm fires when either side exceeds
  * 3·ref_ppm (three average days of cumulative excess/deficit).
  *
  * State-schema compatibility: state rows are VERSION-TAGGED
  * ([[StateVer]]) — r8's silent break (adding `lastDay` to
  * [[CusumState]] made r7 checkpoints fail on encoder mismatch, or
  * worse, a same-shape change would have misdecoded) now fails loud:
  * any future layout/semantics change bumps the tag, and a restore
  * under a mismatched tag throws with the repair path in the message
  * (restart from a fresh checkpoint, re-seed via the batch twin q52 —
  * the prefix statistic's recompute path).
  */
object Changepoint {

  /** State-layout version. Bump on ANY [[CusumState]] shape or
    * semantics change; restore under a mismatched tag throws. */
  val StateVer = 3 // v1 = r7 (no lastDay), v2 = r8 (+lastDay), v3 = +ver

  final case class DayCount(event_type: String, day: Date, c: Long,
      ref_ppm: Long)
  final case class CusumState(ver: Int, p: Long, minP: Long, maxP: Long,
      nDays: Long, maxSPos: Long, maxSNeg: Long, nAlarms: Long,
      firstAlarmDays: Long, // epoch days of first alarm; -1 = none
      lastDay: Long) // high-water mark: last folded epoch day; -1 = none
  final case class Summary(event_type: String, n_days: Long,
      max_s_pos: Long, max_s_neg: Long, n_alarms: Long,
      first_alarm_day: Option[Date])

  /** Fold a key's (sorted) new daily counts into the CUSUM state,
    * emitting the updated summary. Pure — unit-testable without a
    * streaming query. Days must arrive at most once per key (the
    * upstream daily aggregate guarantees the grain) AND in
    * non-decreasing day order ACROSS micro-batches: the upstream daily
    * aggregate must be APPEND-mode behind a watermark (an update-mode
    * aggregate would re-emit a day, and a late day would land behind
    * the prefix). The state carries a last-seen-day high-water mark and
    * silently DROPS any day <= it — a re-emitted or late day cannot
    * corrupt the prefix statistic, it is simply not folded (the batch
    * recompute, q52, is the repair path for late data).
    */
  def step(tpe: String, rows: Iterator[DayCount],
      state: GroupState[CusumState]): Iterator[Summary] = {
    val sorted = rows.toSeq.sortBy(_.day.toLocalDate.toEpochDay)
    state.getOption.foreach(x => require(x.ver == StateVer,
      s"Changepoint state version ${x.ver} != $StateVer — restart from " +
        "a fresh checkpoint and re-seed via the batch twin q52"))
    var s = state.getOption.getOrElse(
      CusumState(StateVer, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -1L, -1L))
    sorted.foreach { r =>
      val epochDay = r.day.toLocalDate.toEpochDay
      if (epochDay > s.lastDay) {
      val p = s.p + (1000000L * r.c - r.ref_ppm)
      val minP = math.min(s.minP, p)
      val maxP = math.max(s.maxP, p)
      val sPos = p - minP
      val sNeg = maxP - p
      val alarm = sPos > 3L * r.ref_ppm || sNeg > 3L * r.ref_ppm
      s = CusumState(StateVer, p, minP, maxP, s.nDays + 1,
        math.max(s.maxSPos, sPos), math.max(s.maxSNeg, sNeg),
        s.nAlarms + (if (alarm) 1L else 0L),
        if (alarm && s.firstAlarmDays < 0) epochDay else s.firstAlarmDays,
        epochDay)
      }
    }
    state.update(s)
    Iterator.single(Summary(tpe, s.nDays, s.maxSPos, s.maxSNeg,
      s.nAlarms,
      if (s.firstAlarmDays < 0) None
      else Some(Date.valueOf(
        java.time.LocalDate.ofEpochDay(s.firstAlarmDays)))))
  }

  /** Apply the monitor to a (possibly streaming) daily-count Dataset. */
  def monitor(days: Dataset[DayCount]): Dataset[Summary] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
  }
}
