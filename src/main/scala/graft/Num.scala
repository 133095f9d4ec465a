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

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE) / COUNT($e)"
}
