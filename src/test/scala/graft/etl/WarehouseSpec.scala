package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("T15 dimDate spans the range inclusive with correct parts") {
    val dd = Warehouse.dimDate(spark, "2016-01-01", "2016-12-31")
    assert(dd.count() == 366) // 2016 is a leap year
    val jan1 = dd.filter($"date_key" === 20160101).collect()(0)
    assert(jan1.getAs[Int]("quarter") == 1)
    assert(jan1.getAs[String]("day_name") == "Friday")
  }

  test("J4 dimFromDistinct mints dense ordered keys") {
    val src = Seq("HIIT", "Yoga", "Cardio", "HIIT", "Yoga").toDF("wt")
    val dim = Warehouse.dimFromDistinct(src, "wt", "type_key", "type_name")
    val rows = dim.orderBy("type_key").collect()
    assert(rows.map(_.getAs[String]("type_name")).toSeq ==
      Seq("Cardio", "HIIT", "Yoga"))
    assert(rows.map(_.getAs[Long]("type_key")).toSeq == Seq(1L, 2L, 3L))
  }

  test("J5+T7 blob dim and bridge resolve tokens") {
    val src = Seq(
      (1, "Squats, Deadlifts and Bench press"),
      (2, "Squats and Yoga")).toDF("user_key", "exercises")
    val dim = Warehouse.dimFromBlob(src, "exercises", "ex_key", "ex_name")
    assert(dim.count() == 4) // squats, deadlifts, bench press, yoga
    val bridge = Warehouse.bridgeFromBlob(src, "user_key", "exercises",
      dim, "ex_key", "ex_name")
    assert(bridge.count() == 5)
    // user 1 and 2 share the squats key
    val squatsKey = dim.filter($"ex_name" === "squats")
      .select("ex_key").collect()(0).getLong(0)
    assert(bridge.filter($"ex_key" === squatsKey).count() == 2)
  }

  test("J2 lookupKey inner drops unresolved, left keeps null") {
    val fact = Seq((1, "yoga"), (2, "unknown")).toDF("id", "name")
    val dim = Seq(("yoga", 10)).toDF("dim_name", "dim_key")
    val inner = Warehouse.lookupKey(fact, $"name", dim, "dim_name", "dim_key")
    assert(inner.count() == 1)
    val left = Warehouse.lookupKey(fact, $"name", dim, "dim_name", "dim_key",
      "left")
    assert(left.count() == 2)
    assert(left.filter($"dim_key".isNull).count() == 1)
  }

  test("A3 unpivot emits one row per metric") {
    val src = Seq((1L, 70.5, 23.1)).toDF("user_key", "weight_kg", "bmi")
    val got = Warehouse.unpivotMetrics(src, Seq("user_key"),
      Seq("weight" -> "weight_kg", "bmi" -> "bmi"))
    val rows = got.orderBy("metric").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("metric")).toSeq == Seq("bmi", "weight"))
    assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(23.1, 70.5))
  }

  test("end-to-end mini star build: dims, bridge, fact with lookups") {
    val raw = Seq(
      ("Alice", 25, "Female", 1.70, 60.0, "Weight Loss", "Yoga, Pilates"),
      ("Bob", 30, "Male", 1.80, 80.0, "Muscle Gain", "Squats"),
      ("Ann", 25, "female", 1.70, 60.0, "Weight Loss", "Yoga")
    ).toDF("name", "age", "gender", "height", "weight", "goal", "exercises")

    val hash = EntityResolution.profileHash($"age", $"gender", $"height",
      $"weight")
    val (dimUser, mapping) =
      EntityResolution.resolve(raw, hash, lit(0), $"name")
    assert(dimUser.count() == 2) // Alice/Ann merge

    val dimGoal = Warehouse.dimFromDistinct(raw, "goal", "goal_key",
      "goal_name")
    val fact = Warehouse.lookupKey(
      mapping.select($"user_key", $"goal", $"weight"),
      $"goal", dimGoal, "goal_name", "goal_key")
    assert(fact.count() == 3)
    assert(fact.select("goal_key").distinct().count() == 2)

    val dimEx = Warehouse.dimFromBlob(raw, "exercises", "ex_key", "ex_name")
    val bridge = Warehouse.bridgeFromBlob(
      mapping.select($"user_key", $"exercises"), "user_key", "exercises",
      dimEx, "ex_key", "ex_name")
    // alice+ann → same user_key {yoga, pilates} ∪ {yoga} = 2; bob {squats}
    assert(bridge.count() == 3)
  }
}
