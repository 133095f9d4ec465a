package graft.streaming

import java.sql.Date

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Parity + idempotence contract for the per-day KMV sketch fold: the
  * O(k)-state streaming fold must agree bit-for-bit with the batch
  * st11 card (itself DuckDB-gated), and re-delivered events must be
  * absorbed by the set union — the property that makes the sketch
  * effectively-once without any high-water mark.
  */
class SlidingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def freshState = org.apache.spark.sql.streaming.TestGroupState
    .create[SlidingKmv.SketchState](
      org.apache.spark.api.java.Optional.empty[SlidingKmv.SketchState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

  private val d0 = Date.valueOf("2020-01-01")

  test("step: re-delivered events are absorbed; overflow engages the estimator") {
    val st = freshState
    val b1 = (1L to 5L).map(SlidingKmv.UserDay(d0, _))
    val s1 = SlidingKmv.step(d0, b1.iterator, st).next()
    assert(s1.k_used == 5 && s1.est == 5)
    // re-deliver the same users (foreachBatch replay shape): no change
    val s2 = SlidingKmv.step(d0, b1.iterator, st).next()
    assert(s2 == s1 && st.get.hs.toSeq == st.get.hs.toSeq.sorted)
    // flood past k: sketch truncates to bottom-k, estimator branch on
    val b3 = (1L to 400L).map(SlidingKmv.UserDay(d0, _))
    val s3 = SlidingKmv.step(d0, b3.iterator, st).next()
    assert(s3.k_used == SlidingKmv.K)
    assert(s3.est ==
      (SlidingKmv.K - 1).toLong * SlidingKmv.M / s3.kth_h)
    // the estimate should be in the right ballpark for 400 distinct
    assert(s3.est > 200 && s3.est < 800, s"est ${s3.est} off for n=400")
  }

  test("stateful monitor == batch st11 card on the events table") {
    val batch = SparkEntry.defs.find(_.name == "st11_daily_kmv").get
      .run(spark, sf).collect()
      .map(r => r.getAs[Date]("day").toString ->
        (r.getAs[Long]("k_used"), r.getAs[Long]("kth_h"),
          r.getAs[Long]("dau_est"))).toMap
    val events = graft.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .as[SlidingKmv.UserDay]
    val streamed = SlidingKmv.monitor(events).collect()
      .map(s => s.day.toString -> (s.k_used, s.kth_h, s.est)).toMap
    assert(streamed.nonEmpty && streamed.keySet == batch.keySet)
    val drift = streamed.filter { case (k, v) => batch(k) != v }
    assert(drift.isEmpty, s"stream/batch sketch drift: ${drift.take(3)}")
  }
}
