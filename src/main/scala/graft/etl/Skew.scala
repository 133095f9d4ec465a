package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting (on by default) covers sort-merge joins;
  * these helpers cover the cases AQE doesn't: hot grouping keys in
  * aggregations, and broadcast-ineligible joins against skewed keys.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) to
    * spread a hot key across `saltBuckets` reducers, then finalize on
    * key. Works for any algebraic aggregate expressed as
    * (partial, merge) column pairs.
    *
    * Example — skew-safe sum+count (and thus avg):
    * {{{
    * saltedAggregate(df, Seq($"k"), 32,
    *   partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
    *   merge   = Seq(sum($"s").as("s"), sum($"c").as("c")))
    * }}}
    *
    * The salt derives from partition id + row position, so the salt of
    * an individual row is NOT stable across retries/re-plans — only the
    * final merged aggregate is deterministic (which is the contract;
    * don't use the salt column itself downstream).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val stage1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys: _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted join of a skewed large side against a small-but-not-
    * broadcastable right side: explode the right side `saltBuckets`
    * times, salt the left deterministically, join on (key, salt).
    * Each hot left key now lands on `saltBuckets` reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(col(key)) + spark_partition_id(), lit(saltBuckets))
        .cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
