package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The runtime half of the skew story: [[Skew]] salts keys the
  * PLANNER can't fix, and AQE's OptimizeSkewedJoin splits oversized
  * join partitions at RUNTIME using real shuffle statistics. This
  * spec pins that the engine's session config actually lets AQE do
  * that — a planted 99%-hot key join re-plans with `skew=true` on the
  * sort-merge join, instead of one straggler task carrying the hot
  * partition (the classic silent 100 TB wall-clock killer). */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed join at runtime") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the DEFAULTS (256 MB / factor 5) target
      // real clusters; here the same mechanism must fire on ~MB data
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin." +
        "skewedPartitionThresholdInBytes", "64KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force the sort-merge path — a broadcast join has no skew to split
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 99% of left rows share key 0; right side is uniform
      val left = spark.range(300000).select(
        when(col("id") % 100 < 99, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(2000).select(
        col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      // run THIS dataset's own query execution (count() would spawn a
      // separate one and leave joined's plan un-adapted): AQE only
      // re-plans from materialized shuffle stats. 297,000 hot-key rows
      // match right k=0; the id%100==99 rows with id<2000 add 20.
      assert(joined.collect().length == 297020)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
