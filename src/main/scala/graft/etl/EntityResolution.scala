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
  * At 100 TB: one shuffle on `profile_hash` for the dedup window; the
  * global row_number for key minting is the only single-partition stage —
  * acceptable because it runs on the *deduped* profiles (orders of
  * magnitude smaller). For truly huge dedup cardinality, swap mintKeys
  * for zipWithIndex-style two-phase numbering (per-partition counts then
  * offset) — the API stays the same.
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
    * replacement for the reference's sequential counter). */
  def mintKeys(df: DataFrame, keyName: String, orderCol: Column): DataFrame =
    df.withColumn(keyName, row_number().over(Window.orderBy(orderCol)))

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
