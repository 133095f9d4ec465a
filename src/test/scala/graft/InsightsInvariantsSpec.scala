package graft

import org.apache.spark.sql.functions._

/** Brute-force differentials and invariants for the behavioral
  * analytics family, on top of the DuckDB oracle gate: the oracle
  * proves Spark ≡ SQL; these prove the SQL means what the operator
  * name claims, by recomputing a sample driver-side from raw events
  * with plain Scala collections.
  */
class InsightsInvariantsSpec extends SparkSpec {

  private lazy val rawEvents = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"), col("value"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
      r.getString(3), r.getDouble(4)))

  test("a18 streaks: longest run matches a driver-side recompute") {
    val got = SparkEntry.queries("a18_streaks")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rawEvents.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (user, evs) =>
      val days = evs.map(e =>
        e._3.toLocalDateTime.toLocalDate.toEpochDay).distinct.sorted
      val longest = days.foldLeft((0L, 0L, Long.MinValue)) {
        case ((best, run, prev), d) =>
          val r = if (d == prev + 1) run + 1 else 1L
          (math.max(best, r), r, d)
      }._1
      assert(got(user) == longest, s"user $user")
    }
  }

  test("a21 OHLC: open/close match the total-order first/last") {
    val got = SparkEntry.queries("a21_ohlc")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(5)))
      .toMap
    val byBar = rawEvents.groupBy(e =>
      (e._1, e._3.toLocalDateTime.toLocalDate.toString))
    assert(got.keySet == byBar.keySet)
    byBar.foreach { case (bar, evs) =>
      // Full-µs order (getTime alone is ms-truncated — sub-ms ties
      // would mis-order open/close vs the query's full-ts sort).
      val ordered = evs.sortBy(e =>
        (e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._2))
      assert(got(bar) == ((ordered.head._5, ordered.last._5)), s"$bar")
    }
  }

  test("a22 transitions: each from-row is a probability distribution " +
      "and counts tally to n_events - n_users") {
    val rows = SparkEntry.queries("a22_transition_matrix")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byFrom = rows.groupBy(_._1)
    byFrom.values.foreach { grp =>
      assert(math.abs(grp.map(_._4).sum - 1.0) < 1e-9)
    }
    val nUsers = rawEvents.map(_._1).distinct.length
    assert(rows.map(_._3).sum == rawEvents.length - nUsers)
  }

  test("a26 audience overlap: intersections bounded and exact for a " +
      "recomputed pair") {
    val rows = SparkEntry.queries("a26_audience_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nA, nB, nBoth) =>
      assert(nBoth <= math.min(nA, nB))
    }
    val sets = rawEvents.groupBy(_._4).view
      .mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (a, b, nA, nB, nBoth) =>
      assert(nA == sets(a).size && nB == sets(b).size &&
        nBoth == (sets(a) & sets(b)).size, s"($a,$b)")
    }
  }

  test("a23 trend: slope matches an exact-integer recompute") {
    val got = SparkEntry.queries("a23_activity_trend")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val daily = rawEvents.groupBy(e =>
        (e._1, e._3.toLocalDateTime.toLocalDate.toEpochDay))
      .view.mapValues(_.size.toLong).toMap
    val byUser = daily.groupBy(_._1._1)
    byUser.foreach { case (user, cells) =>
      if (cells.size >= 2) {
        val n = cells.size.toLong
        val sx = cells.keys.map(_._2).sum
        val sy = cells.values.sum
        val sxy = cells.map { case ((_, d), c) => d * c }.sum
        val sxx = cells.keys.map(k => k._2 * k._2).sum
        val slope =
          (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
        assert(got(user) == slope, s"user $user") // bit-equal by design
      } else assert(!got.contains(user))
    }
  }
}
