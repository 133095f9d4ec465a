package graft.etl

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark lacks natively. For
  * each left row, attach the single LATEST right row whose timestamp is
  * at-or-before the left row's timestamp, within the same key (the
  * sensor-reading-at-event / price-at-trade shape; DuckDB spells it
  * `ASOF JOIN`).
  *
  * The naive Spark formulation — inequality join then `row_number`
  * prune — materializes O(|L|·|R|) pairs per key before pruning (a
  * BroadcastNestedLoopJoin or worse). This union+window formulation is
  * linear: tag both sides, union, ONE shuffle on the key, one
  * within-partition sort by (ts, tag), then carry the last right row
  * forward. The right payload travels as ONE struct column so the
  * carry-forward can never stitch together fields of different right
  * rows (per-column `last(_, ignoreNulls)` would).
  *
  * Requirements: `right` must be unique per (key, ts) — pre-aggregate
  * if it isn't (ties would otherwise resolve by sort instability). At
  * equal timestamps the right row sorts first, so exact-ts matches ARE
  * taken (`rightTs <= leftTs` semantics, matching DuckDB `ASOF JOIN
  * ... ON l.ts >= r.ts`).
  *
  * Scale: one hash shuffle on the key; per-key history sorts within
  * its partition (a monster key ⇒ salt by coarse time bucket first).
  * `toleranceUs` bounds staleness: matches older than the tolerance
  * come back NULL, without changing the plan shape.
  */
object Asof {

  def join(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame =
    directional(left, right, key, leftTs, rightTs, prefix, toleranceUs,
      forward = false)

  /** Forward-direction as-of join (pandas/polars `direction=
    * 'forward'`): for each left row, attach the single EARLIEST right
    * row at-or-after the left timestamp within the key — the
    * "next-touch attribution" / "time-to-next-event" shape. Same
    * linear union+window plan as [[join]], with the within-partition
    * sort DESCENDING so the carry runs backward in time; `toleranceUs`
    * bounds how far AHEAD a match may be. */
  def joinForward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame =
    directional(left, right, key, leftTs, rightTs, prefix, toleranceUs,
      forward = true)

  private def directional(left: DataFrame, right: DataFrame,
      key: Seq[String], leftTs: String, rightTs: String, prefix: String,
      toleranceUs: Option[Long], forward: Boolean): DataFrame = {
    val lPayload = left.columns.filterNot(key.contains).toSeq
    val rPayload = right.columns
      .filterNot(c => key.contains(c) || c == rightTs).toSeq

    val rStruct = struct(
      col(rightTs).as("__rts") +: rPayload.map(col): _*)
    val rSide = right.select(
      key.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag"),
        rStruct.as("__r")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType)
          .as(c)): _*)
    val rType = rSide.schema("__r").dataType
    val lSide = left.select(
      key.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(rType).as("__r")) ++ lPayload.map(col): _*)

    // Backward: ascending time, carry the LAST right row seen.
    // Forward: descending time, same carry = nearest FOLLOWING right
    // row. Either way the right row (__tag 0) sorts before the left at
    // equal __ts, so exact-timestamp matches are taken.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val matched = toleranceUs match {
      case Some(tol) =>
        val age =
          if (forward)
            unix_micros(col("__m.__rts")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__m.__rts"))
        when(age <= tol, col("__m"))
      case None => col("__m")
    }
    carried
      .withColumn("__m", matched)
      .select(key.map(col) ++ lPayload.map(col) ++
        (col(s"__m.__rts").as(s"${prefix}ts") +:
          rPayload.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** The same semantics through the NATIVE physical operator
    * (`plans.AsofJoinExec` — co-partitioned two-pointer merge, no
    * union/struct/window machinery; see its scaladoc for the plan
    * shape). Output columns mirror [[join]] exactly, so the two paths
    * are directly comparable — which is how AsofJoinExecSpec pins the
    * operator. Registers the planner strategy on the session
    * idempotently; `toleranceUs` nulls out matches staler than the
    * bound, same contract as [[join]]. */
  def nativeJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val spark = left.sparkSession
    Bridge.addStrategy(spark, new graft.plans.AsofJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    // self-join guard: the analyzer's DeduplicateRelations only knows
    // built-in Join nodes, so two sides derived from the same scan
    // arrive with IDENTICAL attribute ids and references cross-bind.
    // Re-alias the right side (fresh exprIds) whenever ids collide.
    val rightD =
      if (right.queryExecution.analyzed.output
          .exists(lPlan.outputSet.contains))
        right.select(right.columns.toIndexedSeq.map(c =>
          right(c).as(c)): _*)
      else right
    val rPlan = rightD.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    // The physical merge compares keys with one ordering built from the
    // LEFT key types and reads time via getLong — validate both here so
    // a mismatched caller gets a clear error instead of garbage
    // comparisons or a runtime ClassCastException inside the exec.
    val lKeyAttrs = key.map(attr(lPlan, _))
    val rKeyAttrs = key.map(attr(rPlan, _))
    lKeyAttrs.zip(rKeyAttrs).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"as-of join key '${lk.name}' has mismatched types: " +
          s"left ${lk.dataType.sql} vs right ${rk.dataType.sql}; " +
          "cast one side before joining")
    }
    val lTimeAttr = attr(lPlan, leftTs)
    val rTimeAttr = attr(rPlan, rightTs)
    Seq("left" -> lTimeAttr, "right" -> rTimeAttr).foreach {
      case (side, a) =>
        require(a.dataType == org.apache.spark.sql.types.TimestampType ||
            a.dataType == org.apache.spark.sql.types.LongType,
          s"as-of join $side time column '${a.name}' must be TIMESTAMP " +
            s"or BIGINT (long-backed), got ${a.dataType.sql}")
    }
    val node = graft.plans.AsofJoin(lPlan, rPlan,
      lKeyAttrs, rKeyAttrs, lTimeAttr, rTimeAttr, toleranceUs)
    val joined = Bridge.ofRows(spark, node)
    val lAttrs = node.output.take(lPlan.output.size)
    val rAttrs = node.output.drop(lPlan.output.size)
    val lByName = lAttrs.map(a => a.name -> a).toMap
    val rByName = rAttrs.map(a => a.name -> a).toMap
    val lPayload = left.columns.filterNot(key.contains).toSeq
    val rPayload = right.columns
      .filterNot(c => key.contains(c) || c == rightTs).toSeq
    joined.select(
      (key ++ lPayload).map(c => Bridge.column(lByName(c))) ++
        (Bridge.column(rByName(rightTs)).as(s"${prefix}ts") +:
          rPayload.map(c => Bridge.column(rByName(c)).as(s"$prefix$c"))): _*)
  }
}
