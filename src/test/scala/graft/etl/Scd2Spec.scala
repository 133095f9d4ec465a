package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def state() = Scd2.seed(
    Seq((1, "gold", 10.0), (2, "silver", 20.0), (3, "gold", 30.0))
      .toDF("id", "tier", "bal"),
    lit("2020-01-01"))
  private val asOf = lit("2021-06-15").cast("date")

  test("changed attr closes the open row and appends a new version") {
    val upd = Seq((1, "platinum", 10.0)).toDF("id", "tier", "bal")
    val out = Scd2.merge(state(), upd, Seq("id"), Seq("tier", "bal"), asOf)
      .orderBy("id", "effective_from").collect()
    assert(out.length == 4)
    val v1 = out.filter(_.getAs[Int]("id") == 1)
    assert(v1.length == 2)
    val (closed, open) = (v1(0), v1(1))
    assert(!closed.getAs[Boolean]("is_current") &&
      closed.getAs[String]("tier") == "gold" &&
      closed.getAs[Date]("effective_to").toString == "2021-06-15")
    assert(open.getAs[Boolean]("is_current") &&
      open.getAs[String]("tier") == "platinum" &&
      open.getAs[Date]("effective_from").toString == "2021-06-15" &&
      open.isNullAt(open.fieldIndex("effective_to")))
  }

  test("identical snapshot is a no-op (idempotent re-merge)") {
    val snap = Seq((1, "gold", 10.0), (2, "silver", 20.0))
      .toDF("id", "tier", "bal")
    val once = Scd2.merge(state(), snap, Seq("id"), Seq("tier", "bal"), asOf)
    val twice = Scd2.merge(once, snap, Seq("id"), Seq("tier", "bal"), asOf)
    assert(once.count() == 3 && twice.count() == 3)
    assert(once.orderBy("id", "effective_from").collect().toSeq ==
      twice.orderBy("id", "effective_from").collect().toSeq)
  }

  test("new key inserts an open row; absent key passes through") {
    val upd = Seq((9, "bronze", 0.0)).toDF("id", "tier", "bal")
    val out = Scd2.merge(state(), upd, Seq("id"), Seq("tier", "bal"), asOf)
    assert(out.count() == 4)
    val nine = out.filter($"id" === 9).collect()(0)
    assert(nine.getAs[Boolean]("is_current") &&
      nine.getAs[Date]("effective_from").toString == "2021-06-15")
    // untouched keys keep their seed effective_from
    assert(out.filter($"id" === 2 && $"effective_from" === "2020-01-01")
      .count() == 1)
  }

  test("asOf reads the version effective on the date") {
    val merged = Scd2.merge(state(),
      Seq((1, "platinum", 10.0)).toDF("id", "tier", "bal"),
      Seq("id"), Seq("tier", "bal"), asOf)
    // day before the merge: still gold; on/after: platinum
    val before = Scd2.asOf(merged, lit("2021-06-14")).filter($"id" === 1)
    val after = Scd2.asOf(merged, lit("2021-06-15")).filter($"id" === 1)
    assert(before.collect()(0).getAs[String]("tier") == "gold")
    assert(after.collect()(0).getAs[String]("tier") == "platinum")
    // exactly one version per key at any date
    assert(Scd2.asOf(merged, lit("2021-06-15")).count() == 3)
    // before the seed date the dimension is empty
    assert(Scd2.asOf(merged, lit("2019-12-31")).count() == 0)
  }

  test("closed history passes through and attr compare is null-safe") {
    val first = Scd2.merge(state(),
      Seq((1, "platinum", 10.0)).toDF("id", "tier", "bal"),
      Seq("id"), Seq("tier", "bal"), asOf)
    // null tier: differs from platinum → version 3 for id=1
    val second = Scd2.merge(first,
      Seq((1, null.asInstanceOf[String], 10.0)).toDF("id", "tier", "bal"),
      Seq("id"), Seq("tier", "bal"), lit("2022-01-01").cast("date"))
    val v1 = second.filter($"id" === 1)
      .orderBy("effective_from").collect()
    assert(v1.length == 3)
    assert(v1.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    assert(v1(2).isNullAt(v1(2).fieldIndex("tier")))
    // merging the null snapshot again: null <=> null → no new version
    val third = Scd2.merge(second,
      Seq((1, null.asInstanceOf[String], 10.0)).toDF("id", "tier", "bal"),
      Seq("id"), Seq("tier", "bal"), lit("2023-01-01").cast("date"))
    assert(third.filter($"id" === 1).count() == 3)
  }
}
