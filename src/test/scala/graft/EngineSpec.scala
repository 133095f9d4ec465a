package graft

import org.apache.spark.sql.functions._

/** The facade is aliases-only; this just proves a user can drive real
  * operators through `graft.Engine` without touching inner packages. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("operators run through the Engine facade") {
    val labels = Engine.ConnectedComponents.run(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"))
    assert(labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    val pruned = Engine.BloomPrune.prune(
      Tables.lineitem(spark, sf), "l_orderkey",
      Tables.orders(spark, sf).limit(10).select("o_orderkey"),
      "o_orderkey", expectedKeys = 10L)
    assert(pruned.count() > 0)

    val norm = Engine.Normalize.yesNo(lit("Yes"))
    assert(spark.range(1).select(norm.as("b")).head().getBoolean(0))
  }
}
