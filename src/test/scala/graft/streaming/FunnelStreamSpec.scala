package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Parity contract for the streaming funnel machine: folded
  * incrementally over micro-batches, the per-user (t0, t1, t2) step
  * times must equal the batch q56 relations' first-match semantics on
  * the same events — the O(1)-per-user state is the same computation.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Batch truth straight from q56's step relations: first view, first
    * qualifying click, first qualifying purchase, per user. */
  private def batchTruth: Map[Long, (Long, Long, Long)] = {
    val ev = Tables.events(spark, sf).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy("user_id").agg(min("us").as("t0"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"us" > $"t0" && $"us" <= $"t0" + FunnelStream.WindowUs)
      .groupBy("user_id").agg(min("us").as("t1"), min("t0").as("t0"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"t1" && $"us" <= $"t1" + FunnelStream.WindowUs)
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val all = v.select($"user_id", $"t0")
      .join(c.select($"user_id", $"t1"), Seq("user_id"), "left")
      .join(p.select($"user_id", $"t2"), Seq("user_id"), "left")
    all.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))
    }.toMap
  }

  test("streamed funnel state == batch q56 step relations") {
    val truth = batchTruth
    assert(truth.nonEmpty && truth.values.exists(_._3 > 0),
      "no full conversions in the corpus — the spec would prove nothing")

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .orderBy("ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel_stream")
    val in = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(ev.schema).parquet(in)
    val q = FunnelStream.track(stream)
      .toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream").start()
    try {
      // ts-ordered thirds, one micro-batch each — funnels straddle
      // batch boundaries, which is exactly what the fold must survive
      val n = ev.count()
      val parts = ev.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("ts")))
      Seq((1L, n / 3), (n / 3 + 1, 2 * n / 3), (2 * n / 3 + 1, n))
        .foreach { case (lo, hi) =>
          parts.filter($"rn" >= lo && $"rn" <= hi)
            .drop("rn").coalesce(1).write.mode("append").parquet(in)
          q.processAllAvailable()
        }
      // update-mode memory sink: the LAST row per user is the final
      // state snapshot
      val streamed = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3))))
        .groupBy(_._1).map { case (u, rows) =>
          // later snapshots can only advance t1/t2; take the max tuple
          u -> rows.map(_._2).maxBy(t => (t._1, t._2, t._3))
        }
      // the stream only sees users with at least one event; truth's
      // domain = users with a view
      val viewed = streamed.filter(_._2._1 >= 0)
      assert(viewed.keySet == truth.keySet)
      viewed.foreach { case (u, t) =>
        assert(t == truth(u), s"user $u: stream $t != batch ${truth(u)}")
      }
    } finally q.stop()
  }
}
