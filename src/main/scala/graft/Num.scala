package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-stable numeric helpers.
  *
  * Summing doubles in a distributed aggregate is order-dependent, so a
  * Spark result and a DuckDB oracle can differ in the last ulp and fail a
  * hash compare. We accumulate through exact decimal arithmetic instead:
  * per-row double math is IEEE-identical in both engines, the decimal sum
  * is exact (order-independent), and the final decimal→double cast is
  * deterministic. This costs one codegen'd cast per row — negligible next
  * to the shuffle — and stays exact at any scale factor.
  */
object Num {
  /** Exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  /** Exact-sum average of a double expression, returned as double. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double") / count(c)

  /** SQL fragment equivalents for the DuckDB oracle. The decimal sum
    * leaves through VARCHAR: DuckDB's direct DECIMAL→DOUBLE cast
    * double-rounds once the scaled int128 exceeds 2^53 (~9e9 at scale
    * 6), while the VARCHAR parse is correctly rounded like Spark's
    * BigDecimal path — identical below the threshold, convergent
    * above it (ADVICE r4; same class as the a25/q17/a08/a09 fixes). */
  def sqlDsum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)" +
      s" / COUNT($e)"
}
