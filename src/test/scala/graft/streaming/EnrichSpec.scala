package graft.streaming

import graft.{SparkSpec, Tables}

class EnrichSpec extends SparkSpec {

  test("stream-static enrichment matches the batch join, and the plan " +
      "broadcasts the dim") {
    val dim = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment")
    val batchDf = Enrich.bySegment(Tables.events(spark, sf), dim)
    val batch = batchDf.collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    // the static side must broadcast: the stream is never shuffled
    val plan = batchDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))

    val dir = java.nio.file.Files.createTempDirectory("enrich_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Enrich.start(spark, dir.toString, dim, "enrich_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").collect()
        .map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
