package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the shuffle you pay once at write time instead of on
  * every join. Two tables bucketed the same way on the join key read
  * back CO-LOCATED: the sort-merge join planner sees compatible output
  * partitioning on both sides and drops the per-query Exchange — at
  * 100 TB that's the difference between a metadata decision and
  * re-shuffling the fact table for every downstream join. This spec
  * pins that contract: same-bucketed join plans with NO shuffle, and
  * the identical un-bucketed join DOES shuffle (so the assertion can't
  * rot into vacuous truth if plan strings change).
  */
class BucketedJoinSpec extends SparkSpec {
  import org.apache.spark.sql.SaveMode

  test("same-bucketed tables sort-merge join without a shuffle") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_bucket").toString
    val facts = (1 to 10000).map(i => (i.toLong % 100, i.toLong, i * 1.0))
      .toDF("k", "id", "v")
    val dims = (0 to 99).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")

    spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    facts.write.mode(SaveMode.Overwrite).bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/fact").saveAsTable("graft_bkt_fact")
    dims.write.mode(SaveMode.Overwrite).bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/dim").saveAsTable("graft_bkt_dim")

    // force the SMJ path: with broadcast on, the tiny dim would take a
    // BroadcastHashJoin and the bucketing claim would go untested
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val oldB = spark.conf.get(bcast)
    val oldA = spark.conf.get(aqe)
    try {
      spark.conf.set(bcast, "-1")
      spark.conf.set(aqe, "false")
      val j = spark.table("graft_bkt_fact")
        .join(spark.table("graft_bkt_dim"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() == 10000)

      val unbucketed = spark.read.parquet(s"$base/fact")
        .join(spark.read.parquet(s"$base/dim"), "k")
      val uPlan = unbucketed.queryExecution.executedPlan.toString
      assert(uPlan.contains("Exchange"),
        s"control join should shuffle:\n$uPlan")
    } finally {
      spark.conf.set(bcast, oldB)
      spark.conf.set(aqe, oldA)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }
}
