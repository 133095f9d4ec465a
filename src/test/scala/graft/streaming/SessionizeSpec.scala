package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("step closes sessions on gap and keeps the open one in state") {
    // batch-mode check through the typed API on a small dataset
    val events = Seq(
      Sessionize.Event(1L, ts(0), 1.0),
      Sessionize.Event(1L, ts(10), 2.0),
      Sessionize.Event(1L, ts(100), 3.0), // > 30 min gap → new session
      Sessionize.Event(2L, ts(5), 5.0)
    ).toDS()
    val out = Sessionize.sessions(events).collect()
    // only user 1's first session has CLOSED (the rest remain in state)
    assert(out.length == 1)
    assert(out(0).user_id == 1L && out(0).n_events == 2 &&
      out(0).total_value == 3.0)
  }

  test("stateful operator agrees with the batch SQL reference on events") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", coalesce($"value", lit(0.0)).as("value"))
      .as[Sessionize.Event]
    val batch = Sessionize.sessionsBatch(spark, ev).collect()
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events))
      .toSet
    val stateful = Sessionize.sessions(ev).collect()
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events))
      .toSet
    // flatMapGroupsWithState in batch mode emits only CLOSED sessions;
    // each user's final (open) session stays in state → the stateful
    // output must be exactly the batch sessions minus each user's last.
    val lastPerUser = batch.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).values.toSet
    assert(stateful == batch -- lastPerUser)
    assert(stateful.nonEmpty)
  }

  test("native session_window agrees with the custom sessionizer's " +
      "boundaries and aggregates") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", coalesce($"value", lit(0.0)).as("value"))
    // totals rounded to 6dp: sessionWindows accumulates exact decimals,
    // sessionsBatch sums raw doubles — boundaries/counts must agree
    // exactly, totals up to summation-order ulps
    def canon(t: (Long, Long, Long, Double)) =
      (t._1, t._2, t._3, math.rint(t._4 * 1e6) / 1e6)
    val native = EventStream.sessionWindows(ev).collect()
      .map(r => canon((r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getDouble(3))))
      .toSet
    val reference = Sessionize
      .sessionsBatch(spark, ev.as[Sessionize.Event]).collect()
      .map(s => canon((s.user_id, s.start.getTime, s.n_events.toLong,
        s.total_value)))
      .toSet
    assert(native == reference)
    assert(native.nonEmpty)
  }
}
