package graft.plans

import graft.SparkSpec

/** AQE's runtime skew-join split is the engine's third answer to hot
  * keys (besides the proactive salted agg j08 and salted join j12):
  * when a post-shuffle partition dwarfs the median, AQE splits it and
  * replicates the matching build side — no query rewrite. At 100 TB a
  * single celebrity key otherwise pins one reducer for hours. This
  * spec pins that the mechanism actually fires on this build: a
  * 95%-one-key fact joined un-broadcastable must plan `skew=true`
  * in the final adaptive SortMergeJoin.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("AQE splits the skewed partition of a hot-key join") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skew").toString
    val n = 200000
    // 95% of rows on key 0; payload padding makes the hot partition's
    // bytes clear the (lowered) skew threshold
    (1 to n).map(i =>
        (if (i % 20 == 0) i.toLong % 100 + 1 else 0L, "p" * 64))
      .toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: a real cluster keeps the 256MB defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      // execute THIS dataframe's QueryExecution (count() would build a
      // separate one and leave j's adaptive plan unfinalized)
      assert(j.collect().length == n)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
