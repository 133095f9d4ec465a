package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second join shape Spark
  * lacks natively. A raw `p BETWEEN start AND end` predicate with no
  * equality key plans as BroadcastNestedLoopJoin: every point against
  * every interval, O(|P|·|I|) at any cluster size.
  *
  * Bucketing restores an equi-join: each interval explodes into the
  * fixed-width buckets it covers, each point maps to its single bucket,
  * the join runs on (keys…, bucket) — an ordinary hash shuffle — and an
  * exact containment filter removes same-bucket near-misses. Each
  * (point, interval) pair meets EXACTLY once (the point lives in one
  * bucket), so no post-join dedup is needed.
  *
  * Cost model: expansion factor = avg interval length / bucketWidth,
  * so pick bucketWidth near the typical interval length. Intervals
  * wider than `maxBucketsPerInterval` buckets fail fast with
  * `raise_error` instead of silently exploding an executor.
  * Bounds must stay within ±2^53 (bucket ids compute via floating
  * floor-division).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: String, start: String, end: String, bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b0 = floor(col(start) / bucketWidth)
    val b1 = floor(col(end) / bucketWidth)
    val ip = intervals.withColumn("__bucket", explode(
      when(b1 - b0 >= maxBucketsPerInterval, expr(
        s"raise_error('RangeJoin: interval wider than " +
          s"$maxBucketsPerInterval buckets — raise bucketWidth')"))
        .otherwise(sequence(b0, b1))))
    val pp = points.withColumn("__bucket",
      floor(col(point) / bucketWidth))
    pp.join(ip, (keys :+ "__bucket").toSeq)
      .filter(col(point) >= col(start) && col(point) <= col(end))
      .drop("__bucket")
  }

  /** Interval×interval ANY-OVERLAP join (sessions × promotions,
    * maintenance windows × incidents): pairs where
    * `lStart <= rEnd && rStart <= lEnd`. The raw predicate is again a
    * pure inequality → BroadcastNestedLoopJoin → O(|L|·|R|).
    *
    * Both sides explode into their covered buckets and join on
    * (keys…, bucket). Overlapping pairs share at least one bucket but
    * usually SEVERAL — exactly-once comes from a filter, not a dedup
    * shuffle: a pair is emitted only in the FIRST bucket both cover,
    * `bucket == floor(max(lStart, rStart) / bucketWidth)` (that bucket
    * contains the overlap's left edge, so both sides cover it).
    * Same cost model and width cap as [[pointInInterval]].
    *
    * Column names across the two sides must be disjoint (standard for
    * the star-schema callers this serves). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, keys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = floor(col(s) / bucketWidth)
      val b1 = floor(col(e) / bucketWidth)
      df.withColumn("__bucket", explode(
        when(b1 - b0 >= maxBucketsPerInterval, expr(
          s"raise_error('RangeJoin: interval wider than " +
            s"$maxBucketsPerInterval buckets — raise bucketWidth')"))
          .otherwise(sequence(b0, b1))))
    }
    explodeBuckets(left, lStart, lEnd)
      .join(explodeBuckets(right, rStart, rEnd),
        (keys :+ "__bucket").toSeq)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("__bucket")
  }
}
