package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming dedup parity: the stateful watermark dedup produces exactly
  * the batch dropDuplicates result on the same data. */
class StreamDedupSpec extends SparkSpec {

  test("streaming dedup matches batch dropDuplicates on events") {
    // duplicate the events so the dedup actually removes rows
    val base = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val doubled = base.unionByName(base)

    val batch = StreamDedup.dedup(doubled)
      .select("user_id", "event_id").collect().map(_.toSeq).toSet
    assert(batch.size == base.select("user_id", "event_id")
      .distinct().count().toInt)

    // stream the same rows through a file source
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    doubled.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(doubled.schema)
      .parquet(s"$dir/in")
    val q = StreamDedup.dedup(stream)
      .select("user_id", "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_test").collect()
        .map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup state is evicted once the watermark passes") {
    import spark.implicits._
    // three micro-batches with advancing event time: batch 0's state must
    // be dropped once batch 1 pushes the watermark past it (watermark is
    // computed at end-of-batch and applied next batch, hence batch 2).
    def mkBatch(ids: Range, hour: Int) = ids.map { i =>
      (7L, i.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"))
    }.toDF("user_id", "event_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("dedup_evict")
    val in = s"$dir/in"
    mkBatch(1 to 100, 0).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(mkBatch(1 to 1, 0).schema).parquet(in)
    val q = StreamDedup.dedup(stream, "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_evict").start()
    try {
      q.processAllAvailable() // batch 0: 100 ids @ 00:00
      mkBatch(101 to 200, 10).write.mode("append").parquet(in)
      q.processAllAvailable() // batch 1: watermark → 08:00 at end
      mkBatch(201 to 210, 11).write.mode("append").parquet(in)
      q.processAllAvailable() // batch 2: evicts batch 0's state
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      val rows = state.map(_.numRowsTotal).sum
      // 210 ids seen; batch 0's 100 must be gone from state
      assert(rows > 0 && rows <= 110, s"state not evicted: $rows rows")
      assert(spark.table("dedup_evict").count() == 210)
    } finally q.stop()
  }
}
