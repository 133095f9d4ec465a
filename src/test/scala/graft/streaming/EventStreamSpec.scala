package graft.streaming

import graft.{SparkSpec, Tables}

class EventStreamSpec extends SparkSpec {

  test("streaming windowed agg matches the batch plan on the same data") {
    val batch = EventStream.windowedCounts(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet

    // file streams watch a directory — stage the single parquet into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    // complete mode: the one-shot file stream never advances the
    // watermark past the last windows, so append would withhold them;
    // complete surfaces every window for the full-result comparison.
    val q = EventStream.start(spark, dir.toString, "ev_test", "complete")
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_test").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sliding-window streaming agg matches the batch plan (st04 form)") {
    val batch = EventStream.slidingCounts(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet

    val dir = java.nio.file.Files.createTempDirectory("events_sliding")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    val q = EventStream.start(spark, dir.toString, "ev_sliding",
      "complete", EventStream.slidingCounts)
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_sliding").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // every event is in exactly window/slide = 2 windows: the summed
      // event count across windows is exactly 2x the input rows
      val total = spark.table("ev_sliding")
        .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
      assert(total == 2 * Tables.events(spark, sf).count())
    } finally q.stop()
  }
}
