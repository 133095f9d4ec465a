package graft.plans

import graft.{SparkSpec, Tables}
import graft.etl.Asof
import org.apache.spark.sql.functions._

class AsofJoinExecSpec extends SparkSpec {

  test("native as-of join matches the union+window formulation on real " +
      "events (j05 shape)") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val viaWindow = Asof.join(purch, clicks, Seq("user_id"), "ts", "ts")
      .collect().map(_.toSeq).toSet
    val viaNative = Asof.nativeJoin(purch, clicks, Seq("user_id"), "ts",
        "ts")
      .collect().map(_.toSeq).toSet
    assert(viaNative == viaWindow)
    assert(viaNative.nonEmpty)
  }

  test("tolerance parity: stale matches null out identically on both " +
      "paths") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val tol = Some(3600L * 1000000L) // 1 hour
    val viaWindow = Asof.join(purch, clicks, Seq("user_id"), "ts", "ts",
        toleranceUs = tol).collect().map(_.toSeq).toSet
    val viaNative = Asof.nativeJoin(purch, clicks, Seq("user_id"), "ts",
        "ts", toleranceUs = tol).collect().map(_.toSeq).toSet
    assert(viaNative == viaWindow)
    // the tolerance must actually null something out vs the unbounded run
    val unbounded = Asof.nativeJoin(purch, clicks, Seq("user_id"), "ts",
        "ts").collect().map(_.toSeq).toSet
    assert(viaNative != unbounded)
  }

  test("edge semantics: no-match nulls, exact-ts taken, latest-of-ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "a"), // before any right row → null
      (1L, 200L, "b"), // exact-ts match taken
      (1L, 350L, "c"), // latest at-or-before
      (2L, 500L, "d")  // key with no right rows at all → null
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 200L, "r200"),
      (1L, 300L, "r300"),
      (3L, 100L, "unused")
    ).toDF("k", "t", "rv")
    val got = Asof.nativeJoin(left, right, Seq("k"), "t", "t")
      .orderBy("t", "lv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        Option(r.getString(4)).getOrElse("-"))).toSeq
    assert(got == Seq(
      (1L, 100L, "a", -1L, "-"),
      (1L, 200L, "b", 200L, "r200"),
      (1L, 350L, "c", 300L, "r300"),
      (2L, 500L, "d", -1L, "-")))
  }

  test("the plan is the co-partitioned merge: AsofJoin exec, no window, " +
      "no union") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "r")).toDF("k", "t", "rv")
    val plan = Asof.nativeJoin(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert(!plan.contains("Window"), plan.take(500))
    assert(!plan.contains("Union"), plan.take(500))
  }
}
