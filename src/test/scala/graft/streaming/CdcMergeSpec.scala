package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // Root cause of the one r8 flake: the old form kept ONE continuously-
  // triggered query running while the test thread appended the 2-FILE
  // batch-2 parquet write — the polling file source can list that write
  // mid-commit and split its rows across micro-batches (correct
  // streaming behavior, but it breaks the "in-batch older duplicate
  // loses the within-batch dedup" shape this test asserts, because the
  // dedup only sees one row per batch). Deterministic form: each step
  // is a Trigger.AvailableNow drain started strictly AFTER its input
  // write committed, resumed from the same checkpoint — batch contents
  // are now exact, no polling loops, and the restart additionally
  // exercises checkpoint recovery on every step.
  test("streamed snapshots fold into SCD2 state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val in = s"$dir/in"
    val schema = Seq((1L, "gold", d("2020-01-01")))
      .toDF("id", "tier", "snap_date").schema
    def drain(): Unit = {
      val q = CdcMerge.run(
        spark.readStream.schema(schema).parquet(in),
        s"$dir/state", Seq("id"), Seq("tier"), "snap_date",
        s"$dir/chk",
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      try assert(q.awaitTermination(120000),
        "AvailableNow drain did not terminate in 120s")
      finally q.stop()
    }
    // batch 1: two keys
    Seq((1L, "gold", d("2020-01-01")), (2L, "silver", d("2020-01-01")))
      .toDF("id", "tier", "snap_date")
      .write.mode("append").parquet(in)
    drain()
    val s1 = CdcMerge.current(spark, s"$dir/state")
      .getOrElse(fail("no CDC state published after drain 1"))
    assert(s1.count() == 2 && s1.filter($"is_current").count() == 2)

    // batch 2: key 1 changes, plus an in-batch older duplicate that
    // must lose to the newer row
    Seq((1L, "platinum", d("2021-06-15")),
        (1L, "stale-should-lose", d("2021-06-14")))
      .toDF("id", "tier", "snap_date")
      .write.mode("append").parquet(in)
    drain()
    val s2 = CdcMerge.current(spark, s"$dir/state")
      .getOrElse(fail("no CDC state published after drain 2"))
    assert(s2.count() == 3)
    val v1 = s2.filter($"id" === 1).orderBy("effective_from").collect()
    assert(v1.map(_.getAs[String]("tier")).toSeq ==
      Seq("gold", "platinum"))
    assert(!v1(0).getAs[Boolean]("is_current") &&
      v1(0).getAs[java.sql.Date]("effective_to").toString ==
        "2021-06-15")
    // key 2 untouched and still current
    assert(s2.filter($"id" === 2 && $"is_current").count() == 1)
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
