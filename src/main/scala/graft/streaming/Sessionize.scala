package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: session windows over user events via
  * `flatMapGroupsWithState` — the arbitrary-state API the built-in
  * windowed aggregates can't express (gap-based sessions whose end is
  * data-dependent).
  *
  * State per user is one open session (bounded); a session closes when
  * an event arrives more than `gapSeconds` after the last one, or on
  * processing-time timeout. At scale, state is partitioned by user_id
  * across the cluster and checkpointed by the state store — memory is
  * O(active users), never O(events).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int,
      total: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Int, total_value: Double)

  def gapSeconds: Long = 1800L

  /** Event-time in MICROseconds — the same integer precision the batch
    * twin compares at (`unix_micros`). Both paths must use identical
    * precision: with mixed units (ms here, s there) a gap inside the
    * sub-unit range splits a session in one path and merges it in the
    * other. */
  def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Fold a user's (sorted) new events into the open session, emitting
    * every session that closes. Pure function — unit-testable without a
    * streaming query. State timestamps are epoch-micros. */
  def step(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => micros(e.ts))
    var cur = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      cur match {
        case Some(s) if t - s.last <= gapSeconds * 1000000L =>
          cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          closed += Session(userId, tsOf(s.start), tsOf(s.last), s.n, s.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur match {
      case Some(s) => state.update(s)
      case None    => state.remove()
    }
    closed.result().iterator
  }

  /** Apply sessionization to a (possibly streaming) event Dataset. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch reference implementation (same semantics, pure SQL) used by
    * tests to validate the stateful operator. */
  def sessionsBatch(spark: SparkSession, events: Dataset[Event])
      : Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    events.toDF()
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          expr("unix_micros(ts) - unix_micros(prev_ts)") >
            gapSeconds * 1000000L,
          1).otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("start"), max($"ts").as("end"),
        count(lit(1)).cast("int").as("n_events"),
        sum($"value").as("total_value"))
      .select($"user_id", $"start", $"end", $"n_events", $"total_value")
      .as[Session]
  }
}
