package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  /** processAllAvailable can return while the suite's shared session is
    * heavily contended; poll briefly for the published state version so
    * a slow publish fails with a clear timeout, not a None.get. */
  private def awaitState(stateDir: String,
      q: org.apache.spark.sql.streaming.StreamingQuery) = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var s = CdcMerge.current(spark, stateDir)
    while (s.isEmpty && System.nanoTime() < deadline) {
      q.processAllAvailable(); Thread.sleep(200)
      s = CdcMerge.current(spark, stateDir)
    }
    s.getOrElse(fail(s"no CDC state published in $stateDir within 30s"))
  }

  test("streamed snapshots fold into SCD2 state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val in = s"$dir/in"
    val schema = Seq((1L, "gold", d("2020-01-01")))
      .toDF("id", "tier", "snap_date").schema
    // batch 1: two keys
    Seq((1L, "gold", d("2020-01-01")), (2L, "silver", d("2020-01-01")))
      .toDF("id", "tier", "snap_date")
      .write.mode("append").parquet(in)
    val q = CdcMerge.run(
      spark.readStream.schema(schema).parquet(in),
      s"$dir/state", Seq("id"), Seq("tier"), "snap_date",
      s"$dir/chk")
    try {
      q.processAllAvailable()
      val s1 = awaitState(s"$dir/state", q)
      assert(s1.count() == 2 && s1.filter($"is_current").count() == 2)

      // batch 2: key 1 changes, plus an in-batch older duplicate that
      // must lose to the newer row
      Seq((1L, "platinum", d("2021-06-15")),
          (1L, "stale-should-lose", d("2021-06-14")))
        .toDF("id", "tier", "snap_date")
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      var s2 = awaitState(s"$dir/state", q)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (s2.count() < 3 && System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
        s2 = awaitState(s"$dir/state", q)
      }
      assert(s2.count() == 3)
      val v1 = s2.filter($"id" === 1).orderBy("effective_from").collect()
      assert(v1.map(_.getAs[String]("tier")).toSeq ==
        Seq("gold", "platinum"))
      assert(!v1(0).getAs[Boolean]("is_current") &&
        v1(0).getAs[java.sql.Date]("effective_to").toString ==
          "2021-06-15")
      // key 2 untouched and still current
      assert(s2.filter($"id" === 2 && $"is_current").count() == 1)
    } finally q.stop()
  }

  test("replaying an applied batch id is a no-op (crash recovery)") {
    val dir = java.nio.file.Files.createTempDirectory("cdc2").toString
    val b = Seq((1L, "gold", d("2020-01-01")))
      .toDF("id", "tier", "snap_date")
    CdcMerge.applyBatch(b, 0L, s"$dir/state", Seq("id"), Seq("tier"),
      "snap_date")
    val once = CdcMerge.current(spark, s"$dir/state").get.collect().toSeq
    // same batch id re-delivered (foreachBatch does this after restart)
    val dup = Seq((1L, "SHOULD-NOT-APPLY", d("2022-01-01")))
      .toDF("id", "tier", "snap_date")
    CdcMerge.applyBatch(dup, 0L, s"$dir/state", Seq("id"), Seq("tier"),
      "snap_date")
    assert(CdcMerge.current(spark, s"$dir/state").get.collect().toSeq ==
      once)
  }
}
