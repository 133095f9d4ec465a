package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1/J3 — cross-source entity resolution + surrogate key minting
  * (main_etl_pipeline.py:161-312).
  *
  * The reference walks rows sequentially, minting `next_user_id += 1` and
  * reusing keys on profile-hash collisions. That serialization point
  * disappears here: dedup is a window over the hash, key minting is a
  * `row_number` over the deduped set — fully distributed, deterministic
  * (explicit orderBy everywhere; no `monotonically_increasing_id`).
  *
  * At 100 TB: one shuffle on `profile_hash` for the dedup window; key
  * minting is two-phase zipWithIndex-style numbering (range-partition on
  * the order key, per-partition row_number, plus a broadcast per-partition
  * offset) — no single-partition window anywhere.
  */
object EntityResolution {

  /** Composite profile hash (main_etl_pipeline.py:184-187): rounded
    * continuous fields keep float noise out of the key. */
  def profileHash(age: Column, gender: Column, height: Column,
      weight: Column): Column =
    concat_ws("_", age.cast("int"), lower(trim(gender)),
      format_number(height, 2), format_number(weight, 1))

  /** Dedup rows sharing `hashCol`, keeping the row with lowest
    * (sourcePriority, tieBreaker) — deterministic survivor selection
    * (the reference keeps the first-seen row; source order mendeley →
    * gym → fitbit is its insertion order). */
  def dedupByHash(df: DataFrame, hashCol: Column, sourcePriority: Column,
      tieBreaker: Column): DataFrame = {
    val w = Window.partitionBy(hashCol).orderBy(sourcePriority, tieBreaker)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Mint dense surrogate keys 1..N over `orderCol` (deterministic
    * replacement for the reference's sequential counter).
    *
    * Two-phase distributed numbering — never a global single-partition
    * window: (1) range-partition by the order key so partition index
    * order == global key order; (2) count rows per partition (tiny agg)
    * and turn counts into exclusive prefix-sum offsets (window over ≤
    * #partitions rows); (3) broadcast-join the offsets back and number
    * within each partition. Requires `orderCol` be unique per row for a
    * deterministic assignment (callers pass the deduped profile hash). */
  def mintKeys(df: DataFrame, keyName: String, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    // phase 1: one count job over the range-partitioned data (the
    // zipWithIndex pattern); ≤ #partitions rows come back to the driver
    // and return as exclusive prefix-sum offsets via a broadcast join.
    // repartitionByRange sampling is deterministic for a given input, so
    // phase 2 sees identical partition contents.
    val cnts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = cnts.map(_._1)
      .zip(cnts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    import spark.implicits._
    parted.join(broadcast(offsets.toDF("__pid", "__offset")), Seq("__pid"))
      .withColumn(keyName,
        (col("__offset") + row_number().over(
          Window.partitionBy(col("__pid")).orderBy(orderCols: _*)))
          .cast("int"))
      .drop("__pid", "__offset")
  }

  /** Full resolution: hash → dedup → mint; returns canonical profiles
    * with `user_key` plus a mapping DataFrame (source row → user_key),
    * mirroring the reference's `user_mapping` dict
    * (main_etl_pipeline.py:189-262). */
  def resolve(profiles: DataFrame, hashCol: Column, sourcePriority: Column,
      tieBreaker: Column): (DataFrame, DataFrame) = {
    val hashed = profiles.withColumn("profile_hash", hashCol)
    val canonical = mintKeys(
      dedupByHash(hashed, col("profile_hash"), sourcePriority, tieBreaker),
      "user_key", col("profile_hash"))
    val mapping = hashed.join(
      canonical.select(col("profile_hash"), col("user_key")),
      Seq("profile_hash"), "left")
    (canonical, mapping)
  }
}
