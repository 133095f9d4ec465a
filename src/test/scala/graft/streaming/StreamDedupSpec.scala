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
}
