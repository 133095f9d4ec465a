package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table co-location — the PRE-SHUFFLE pattern for joins
  * that repeat on the same key: pay the key shuffle ONCE at write
  * time (`bucketBy` splits every file by `hash(key) % n`), and every
  * later join/aggregate on that key plans with ZERO exchanges — both
  * sides' scans already satisfy the hash-distribution the join
  * requires. At 100 TB this converts the dominant recurring fact⋈fact
  * shuffle of a daily pipeline into a one-time layout cost, exactly
  * like the reference warehouse's clustered indexes amortize its
  * repeated validation joins.
  *
  * Mechanics pinned by BucketingSpec: joining two tables bucketed
  * `n`×same key plans a SortMergeJoin with NO ShuffleExchange on
  * either side, and a follow-on groupBy on (a superset including) the
  * bucket key adds none either. Writes repartition to one file per
  * bucket first — multiple writer tasks would otherwise emit one
  * file per (task, bucket), and per-file sorts lose the sorted-scan
  * benefit.
  */
object Bucketing {

  /** Write `df` as a parquet-backed bucketed+sorted table (external,
    * at `path`) and return the catalog-backed DataFrame to join on.
    * Overwrites any previous table of the same name. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, nBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.repartition(nBuckets, col(key))
      .write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)
    spark.table(tableName)
  }

  /** True iff `df`'s physical plan contains no shuffle exchange — the
    * co-location proof (broadcast exchanges don't count; they are the
    * cheap kind). Walks the plan tree (descending into AQE wrappers,
    * query stages and reused exchanges) rather than string-matching
    * the rendering, so the proof can't go vacuously true if the plan
    * text format changes. */
  def isShuffleFree(df: DataFrame): Boolean =
    shuffleNodes(df.queryExecution.executedPlan) == 0

  private def shuffleNodes(
      p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      shuffleNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      shuffleNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      shuffleNodes(r.child)
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      1 + e.children.map(shuffleNodes).sum
    case other => other.children.map(shuffleNodes).sum
  }

  /** Re-bucket two UNBUCKETED relations onto the same key
    * distribution for a multi-consumer co-located join session:
    * one explicit shuffle each, after which joins/aggregates between
    * them on `key` reuse the partitioning. For recurring pipelines
    * prefer [[writeBucketed]] — this is the transient, in-session
    * form. */
  def coPartition(a: DataFrame, b: DataFrame, key: String,
      partitions: Int): (DataFrame, DataFrame) =
    (a.repartition(partitions, col(key)),
      b.repartition(partitions, col(key)))

  /** Drop a bucketed table's catalog entry (files at `path` remain
    * until overwritten). */
  def drop(spark: SparkSession, tableName: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
}
