package graft.streaming

import java.sql.Date

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Parity contract for the CUSUM monitor: the O(1)-state streaming
  * fold must agree with the two-window batch form (st09) on the same
  * daily series — Page's prefix identity is what makes them the same
  * computation, and the zero-initialized state is what makes the
  * running-min/max terms include the empty prefix on both sides.
  */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  test("step: alarms fire on a planted level shift, state stays O(1)") {
    // 10 quiet days at ~100/day, then a shift to 200/day
    val ref = 100L * 1000000L
    val rows = (0 until 20).map { i =>
      Changepoint.DayCount("t", Date.valueOf(
        java.time.LocalDate.ofEpochDay(19000L + i)),
        if (i < 10) 100L else 200L, ref)
    }
    val state = org.apache.spark.sql.streaming.TestGroupState.create[
      Changepoint.CusumState](
      org.apache.spark.api.java.Optional.empty[Changepoint.CusumState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = Changepoint.step("t", rows.iterator, state).toSeq
    assert(out.length == 1)
    val s = out.head
    assert(s.n_days == 20)
    // 10 days of +100 excess = 10⁹ cumulative, way past 3·ref
    assert(s.max_s_pos == 10L * 100L * 1000000L)
    assert(s.n_alarms > 0 && s.first_alarm_day.nonEmpty)
    // alarm fires on the 4th shifted day (cum excess 400 > 3·100 avg)
    assert(s.first_alarm_day.get ==
      Date.valueOf(java.time.LocalDate.ofEpochDay(19013L)))
  }

  test("step: re-emitted / late days are dropped by the high-water mark") {
    val ref = 100L * 1000000L
    def day(i: Long) = Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i))
    def emptyState = org.apache.spark.sql.streaming.TestGroupState.create[
      Changepoint.CusumState](
      org.apache.spark.api.java.Optional.empty[Changepoint.CusumState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // batch 1: days 0..4 clean
    val st = emptyState
    val b1 = (0L until 5L).map(i => Changepoint.DayCount("t", day(i), 100L, ref))
    Changepoint.step("t", b1.iterator, st).toSeq
    val afterB1 = st.get
    // batch 2: day 4 RE-EMITTED (update-mode upstream) with a huge count
    // plus a LATE day 2 — both must be dropped, only day 5 folds
    val b2 = Seq(
      Changepoint.DayCount("t", day(4), 999L, ref), // re-emit
      Changepoint.DayCount("t", day(2), 999L, ref), // late
      Changepoint.DayCount("t", day(5), 100L, ref))
    val out = Changepoint.step("t", b2.iterator, st).toSeq
    assert(out.head.n_days == 6, "exactly one new day folded")
    assert(out.head.n_alarms == 0,
      "the poisoned re-emit must not reach the prefix statistic")
    assert(st.get.lastDay == afterB1.lastDay + 1)
    // a batch of ONLY stale days leaves the state untouched
    val before = st.get
    Changepoint.step("t",
      Iterator(Changepoint.DayCount("t", day(1), 999L, ref)), st).toSeq
    assert(st.get == before)
  }

  test("stateful monitor == batch st09 on the events table") {
    val batch = SparkEntry.defs.find(_.name == "st09_cusum_monitor").get
      .run(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("max_s_pos"),
          r.getAs[Long]("max_s_neg"), r.getAs[Long]("n_alarms"),
          Option(r.getAs[Date]("first_alarm_day")))).toMap
    // feed the monitor the same daily series with the same reference
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("ref_ppm", expr(
        "(1000000L * sum(c) OVER (PARTITION BY event_type))" +
          " div (count(1) OVER (PARTITION BY event_type))"))
      .select($"event_type", $"day", $"c", $"ref_ppm")
      .as[Changepoint.DayCount]
    val streamed = Changepoint.monitor(daily).collect()
      .map(s => s.event_type ->
        (s.n_days, s.max_s_pos, s.max_s_neg, s.n_alarms,
          s.first_alarm_day)).toMap
    assert(streamed.keySet == batch.keySet && batch.nonEmpty)
    streamed.foreach { case (k, v) =>
      assert(v == batch(k), s"$k: stream $v != batch ${batch(k)}")
    }
  }

  test("restore under a mismatched state version fails loud") {
    val ref = 100L * 1000000L
    val stale = org.apache.spark.sql.streaming.TestGroupState.create[
      Changepoint.CusumState](
      org.apache.spark.api.java.Optional.of(Changepoint.CusumState(
        Changepoint.StateVer - 1, 0L, 0L, 0L, 0L, 0L, 0L, 0L, -1L, -1L)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val rows = Seq(Changepoint.DayCount("t",
      Date.valueOf(java.time.LocalDate.ofEpochDay(19000L)), 100L, ref))
    val e = intercept[IllegalArgumentException] {
      Changepoint.step("t", rows.iterator, stale)
    }
    assert(e.getMessage.contains("state version"))
  }
}
