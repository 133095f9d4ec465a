package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType}

/** Type-2 slowly-changing-dimension merge — the incremental alternative
  * to the reference's drop-and-rebuild warehouse load
  * (main_etl_pipeline.py:714-760 recreates every table each run). At
  * warehouse scale you close and append dimension versions; you don't
  * rewrite the dimension.
  *
  * State model: `key ++ attrs ++ (effective_from: date,
  * effective_to: date — null = open, is_current: boolean)`.
  */
object Scd2 {

  /** Merge a snapshot of `updates` (one row per natural key, attrs at
    * their as-of values) into SCD2 `current`:
    *
    *   - open row + changed attrs  → close it (`effective_to = asOf`)
    *     AND append a new open version with the updated attrs;
    *   - open row + identical attrs → pass through (idempotent re-merge);
    *   - key absent from `current` → insert as a new open row;
    *   - update absent for an open row → pass through;
    *   - closed (historical) rows   → pass through untouched.
    *
    * Plan shape, chosen for updates ≪ current (the normal incremental
    * case): a LEFT join of the open slice with the updates — broadcast-
    * able, so the (huge) current dimension NEVER shuffles while the
    * update snapshot fits — plus a key-only anti-join for brand-new
    * keys, which shuffles just the pruned key column of the open slice.
    * (A single full-outer join would be one join instead of two, but
    * Spark cannot broadcast a full outer — it forces a full shuffle of
    * every current column on every merge.) Both emitted versions of a
    * changed row come from the same joined row via explode; the
    * historical slice is a union pass-through. Attribute comparison is
    * null-safe (`<=>`).
    */
  def merge(current: DataFrame, updates: DataFrame, key: Seq[String],
      attrs: Seq[String], asOf: Column): DataFrame = {
    val outCols = key ++ attrs ++
      Seq("effective_from", "effective_to", "is_current")
    val open = current.filter(col("is_current"))
    val closedHist = current.filter(!col("is_current"))
      .select(outCols.map(col): _*)
    val u = updates.select(
      key.map(col) ++ attrs.map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__new"): _*)

    val noDate = lit(null).cast(DateType)
    def version(attrCols: Seq[Column], from: Column, to: Column,
        isCur: Column): Column =
      struct(attrCols ++ Seq(from.as("effective_from"),
        to.as("effective_to"), isCur.cast(BooleanType).as("is_current")): _*)
    val oldAttrs = attrs.map(c => col(c).as(c))
    val newAttrs = attrs.map(c => col(s"__u_$c").as(c))

    val joined = open.join(u, key, "left")
    val changed = coalesce(col("__new"), lit(false)) &&
      attrs.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val emit = when(changed, array(
        version(oldAttrs, col("effective_from"), asOf, lit(false)),
        version(newAttrs, asOf, noDate, lit(true))))
      .otherwise(array(
        version(oldAttrs, col("effective_from"), col("effective_to"),
          lit(true))))
    val merged = joined
      .select(key.map(col) :+ explode(emit).as("__v"): _*)
      .select(key.map(col) ++
        (attrs ++ Seq("effective_from", "effective_to", "is_current"))
          .map(c => col(s"__v.$c").as(c)): _*)

    val inserts = u
      .join(open.select(key.map(col): _*), key, "left_anti")
      .select(key.map(col) ++
        newAttrs.map(identity) ++ Seq(asOf.cast(DateType)
            .as("effective_from"),
          noDate.as("effective_to"),
          lit(true).as("is_current")): _*)

    merged.unionByName(inserts).unionByName(closedHist)
  }

  /** Seed an SCD2 state from a plain dimension snapshot: every row open
    * since `from`. */
  def seed(snapshot: DataFrame, from: Column): DataFrame = snapshot
    .withColumn("effective_from", from.cast(DateType))
    .withColumn("effective_to", lit(null).cast(DateType))
    .withColumn("is_current", lit(true))

  /** Point-in-time read: the dimension exactly as it stood on `at` —
    * the version whose [effective_from, effective_to) interval covers
    * the date. A pure filter (no shuffle, pushes to the scan), so a
    * fact build can broadcast-join the result like any dim. */
  def asOf(state: DataFrame, at: Column): DataFrame = {
    val d = at.cast(DateType)
    state.filter(col("effective_from") <= d &&
      (col("effective_to").isNull || col("effective_to") > d))
  }
}
