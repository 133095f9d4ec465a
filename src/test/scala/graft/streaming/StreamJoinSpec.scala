package graft.streaming

import graft.{SparkSpec, Tables}

class StreamJoinSpec extends SparkSpec {

  test("stream-stream interval join matches the batch join on the same " +
      "data") {
    val batch = StreamJoin.attributed(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture produced no view→purchase pairs")

    val dir = java.nio.file.Files.createTempDirectory("events_sjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    // inner stream-stream joins emit on match (watermarks only bound
    // state), so append mode surfaces every pair of the one-shot file
    val q = StreamJoin.start(spark, dir.toString, "sjoin_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("sjoin_test").collect()
        .map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("outer join emits null-matched views only after the watermark " +
      "proves no match can arrive") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    import spark.implicits._

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def rows(specs: Seq[(Long, Int, String)]) = specs.map {
      case (id, hour, typ) =>
        (id, new Timestamp(base + hour * 3600000L +
          (if (typ == "purchase") 300000L else 0L)), typ,
          if (typ == "purchase") 9.99 else 0.0)
    }.toDF("user_id", "ts", "event_type", "value")
      .withColumn("event_id", col("user_id"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("sjoin_outer")
    val in = s"$dir/in"
    // hour 0: users 1-5 view+purchase (converted), users 6-10 view only
    rows((1L to 5L).flatMap(i => Seq((i, 0, "view"), (i, 0, "purchase")))
      ++ (6L to 10L).map(i => (i, 0, "view"))).write
      .mode("append").parquet(in)
    val q = StreamJoin.startOuter(spark, in, "sjoin_outer")
    try {
      q.processAllAvailable()
      val matched = spark.table("sjoin_outer")
      assert(matched.filter(col("purchase_ts").isNotNull).count() == 5)
      // abandoned views CANNOT have emitted yet: the watermark hasn't
      // passed view_ts + window, a purchase could still arrive
      assert(matched.filter(col("purchase_ts").isNull).count() == 0)
      // hour 10 traffic advances the watermark far past hour 0+horizon
      rows((11L to 12L).flatMap(i =>
        Seq((i, 10, "view"), (i, 10, "purchase")))).write
        .mode("append").parquet(in)
      q.processAllAvailable()
      rows(Seq((13L, 11, "view"), (13L, 11, "purchase"))).write
        .mode("append").parquet(in)
      q.processAllAvailable()
      val nulls = spark.table("sjoin_outer")
        .filter(col("purchase_ts").isNull)
        .select("user_id").collect().map(_.getLong(0)).sorted
      assert(nulls.toSeq == (6L to 10L),
        s"expected users 6-10 as abandoned views, got ${nulls.toSeq}")
    } finally q.stop()
  }

  test("join state is watermark-bounded (eviction actually happens)") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    import spark.implicits._

    // event pairs (view + purchase 5 min later) at advancing hours; each
    // wave lands as its own micro-batch via file appends. (Times sit in
    // 2024, well away from the initial epoch-0 watermark — event times
    // AT the watermark are dropped as late, which epoch-0 rows would
    // trip over.)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def wave(ids: Range, hour: Int) = ids.flatMap { i =>
      Seq((i.toLong, new Timestamp(base + hour * 3600000L), "view", 0.0),
        (i.toLong, new Timestamp(base + hour * 3600000L + 300000L),
          "purchase", 9.99))
    }.toDF("user_id", "ts", "event_type", "value")
      .withColumn("event_id", col("user_id"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("sjoin_evict")
    val in = s"$dir/in"
    wave(1 to 50, 0).write.mode("append").parquet(in)
    val q = StreamJoin.start(spark, in, "sjoin_evict")
    try {
      q.processAllAvailable() // batch 0: 50 pairs @ hour 0
      val afterMatch = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterMatch >= 100, s"state should buffer both sides: " +
        s"$afterMatch")
      // advance event time far past hour 0 + horizon (30m join + 1h
      // watermark); the NEXT batch applies the new watermark and evicts
      wave(51 to 60, 10).write.mode("append").parquet(in)
      q.processAllAvailable()
      wave(61 to 70, 11).write.mode("append").parquet(in)
      q.processAllAvailable()
      val endState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // hour-0's 100 buffered rows must be gone; only the recent waves'
      // rows (≤40) remain inside the horizon
      assert(endState <= 40, s"state not evicted: $afterMatch -> $endState")
      assert(spark.table("sjoin_evict").count() == 70)
    } finally q.stop()
  }
}
