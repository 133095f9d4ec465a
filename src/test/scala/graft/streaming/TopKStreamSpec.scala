package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.functions._

/** Streaming heavy-hitters: the sharded-sketch stream must reproduce the
  * exact batch top-k (x22's semantics) on the same data, with per-shard
  * state bounded by the sketch capacity regardless of domain size. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private val k = 10
  private val shards = 4

  test("step keeps state bounded at capacity even on unbounded domains") {
    val agg = new SpaceSavingTopK(16, 5)
    // 10_000 distinct tokens through one shard: state must stay at 16
    val toks = (0 until 10000).iterator.map(i => TopKStream.Tok(0, s"t$i"))
    var state: Map[String, (Long, Long)] = agg.zero
    toks.grouped(500).foreach { batch =>
      state = batch.foldLeft(state)((b, t) => agg.reduce(b, t.tok))
    }
    assert(state.size == 16)
  }

  test("streamed sharded sketches reproduce the exact batch top-k") {
    val texts = Tables.documents(spark, sf).select($"text").as[String]
    val exact = texts.toDF("value")
      .select(explode(split(lower($"value"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(k)
      .as[(String, Long)].collect().toSeq

    // stream the same texts in two micro-batches through a file source
    val dir = java.nio.file.Files.createTempDirectory("topk_stream")
    val in = s"$dir/in"
    val df = texts.toDF("value")
    val Array(half1, half2) = df.randomSplit(Array(0.5, 0.5), seed = 42)
    half1.write.mode("append").parquet(in)
    val stream = spark.readStream.schema(df.schema).parquet(in)
    val cands = TopKStream.candidates(
      TopKStream.tokens(stream.as[String], shards), capacity = 8 * k, k = k)
    val q = cands.writeStream.outputMode("update")
      .format("memory").queryName("topk_test").start()
    try {
      q.processAllAvailable()
      half2.write.mode("append").parquet(in)
      q.processAllAvailable()
      // latest snapshot = max count per (token) across emitted rows
      // (counts only grow), then the exact ≤ shards×k merge
      val snapshot = spark.table("topk_test").as[TopKStream.Candidate]
      val merged = TopKStream.mergeSnapshot(spark, snapshot, k)
        .collect().toSeq
      assert(merged == exact,
        s"stream $merged != batch $exact")
    } finally q.stop()
  }
}
