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

  test("restore under a mismatched state version fails loud") {
    val stale = org.apache.spark.sql.streaming.TestGroupState
      .create[SlidingKmv.SketchState](
        org.apache.spark.api.java.Optional.of(
          SlidingKmv.SketchState(SlidingKmv.StateVer - 1, Array(1L, 2L))),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
    val e = intercept[IllegalArgumentException] {
      SlidingKmv.step(d0,
        Iterator(SlidingKmv.UserDay(d0, 1L)), stale)
    }
    assert(e.getMessage.contains("state version"))
  }

  test("monitorEvents evicts days behind the watermark without changing emissions") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("kmv_evict")
    val in = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def rows(days: Seq[Int]) = days.flatMap(dd => (0 until 5).map(u =>
      (new Timestamp(1577836800000L + dd * 86400000L + u * 1000L),
        (dd * 100 + u).toLong))).toDF("ts", "user_id")
    val schema = rows(Seq(0)).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    // retention 2 days: a day's state evicts once wm > day end + 3d
    val q = SlidingKmv.monitorEvents(stream, retentionDays = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_evict").start()
    try {
      rows(0 until 10).coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val populated = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // the post-batch no-data pass may already evict the oldest days
      // (wm = day9 − 2d ⇒ days 0..4's evictAt has passed): 5 ≤ n ≤ 10
      assert(populated >= 5 && populated <= 10,
        s"expected 5..10 day states: $populated")
      // two far-future days: the first advances the watermark past all
      // ten original eviction points, the second triggers the batch in
      // which those timeouts fire (the NearDupStreamSpec sentinel shape)
      rows(Seq(30)).coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      rows(Seq(31)).coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after <= 2, s"day state not evicted: $after rows")
      // emissions (latest per day) must equal the batch fold over the
      // SAME events — eviction capped the store, never the values
      val streamed = spark.table("kmv_evict").collect()
        .map(r => (r.getAs[Date]("day").toString,
          (r.getAs[Long]("k_used"), r.getAs[Long]("kth_h"),
            r.getAs[Long]("est")))).toMap
      val batch = SlidingKmv.monitor(
        rows((0 until 10) ++ Seq(30, 31))
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .as[SlidingKmv.UserDay]).collect()
        .map(s => s.day.toString -> (s.k_used, s.kth_h, s.est)).toMap
      assert(streamed == batch,
        s"evicted stream drifted from batch: ${streamed.toSet diff batch.toSet}")
    } finally q.stop()
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
