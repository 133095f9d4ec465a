package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E1 end-to-end: extract → transform → load → validate → report over
  * the FIXTURES.md-shaped demo inputs (main_etl_pipeline.py:947-976
  * composition, clean semantics per SURVEY §1.4). */
class PipelineSpec extends SparkSpec {

  private lazy val res =
    Pipeline.run(spark, Pipeline.demoInputs(spark), None)

  test("builds all 19 warehouse tables in load order") {
    val names = res.tables.map(_._1)
    assert(names.size == 19)
    assert(names.take(11).forall(_.startsWith("dim_")))
    assert(names.slice(11, 14).forall(_.startsWith("bridge_")))
    assert(names.drop(14).forall(_.startsWith("fact_")))
  }

  test("entity resolution dedups in-source and across sources") {
    val users = res.table("dim_user")
    // mendeley: 4 rows, ids 1+3 share a profile → 3 users; gym: 2 rows,
    // one matches mendeley id=1's profile → +1 new; fitbit: 2 ids → +2
    assert(users.count() == 6)
    // the cross-source duplicate kept the mendeley (priority 1) survivor
    val bySource = users.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("mendeley" -> 3L, "gym" -> 1L, "fitbit" -> 2L))
    // surrogate keys are dense 1..N
    val keys = users.select("user_key").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == (1L to 6L))
  }

  test("snapshot fact: one row per user, goals standardized, BMI nulled") {
    val snap = res.table("fact_usersnapshot")
    assert(snap.count() == 6) // one per resolved user, fitbit included
    val goals = res.table("dim_fitnessgoal").select("goal_name")
      .collect().map(_.getString(0)).toSet
    // "Weight Loss"→lose_weight, "Muscle Gain"→build_muscle,
    // "endurance running"→endurance, gym "HIIT"/fitbit→maintain_health
    assert(goals == Set("lose_weight", "build_muscle", "endurance",
      "maintain_health"))
    // mendeley id=4's BMI 120 is out of (10,60) → nulled; fitbit rows
    // carry no physical profile at all
    assert(snap.filter(col("bmi").isNull).count() == 3)
  }

  test("workout sessions keep only active rows with resolvable users") {
    val sess = res.table("fact_workoutsession")
    assert(sess.count() == 3) // 4 activity rows − 1 zero-active
    assert(sess.filter(col("duration_hours") <= 0).count() == 0)
  }

  test("health metrics: sleep summed, hr averaged, weight unpivoted") {
    val m = res.table("fact_healthmetric")
      .join(res.table("dim_metrictype"), "metric_type_key")
    val byType = m.groupBy("metric_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sleep: 2 days (id1 day1, id2 day2); hr: 2 (id1, id2 same day);
    // weight: 2 kg rows; bmi: 1 (the 199 one nulled → dropped)
    assert(byType ==
      Map("sleep" -> 2L, "heart_rate" -> 2L, "weight" -> 2L, "bmi" -> 1L))
    val sleepVal = m.filter(col("metric_name") === "sleep" &&
      col("date_key") === 20160325).select("value")
      .head().getDouble(0)
    assert(sleepVal == 1.92) // (60+55)/60 rounded 2
  }

  test("hourly activity fact aggregates to the user-hour grain") {
    val h = res.table("fact_hourlyactivity")
    // 4 fixture rows, two share (user, day, hour) → 3 grain rows
    assert(h.count() == 3)
    val sameHour = h.filter(col("hour_of_day") === 1)
      .select("calories").collect().map(_.getInt(0)).toSeq
    assert(sameHour == Seq(48 + 30))
    // every row resolves to a real user and date key
    val users = res.table("dim_user")
    assert(h.join(users, Seq("user_key")).count() == 3)
  }

  test("food dim strips units, dedups, keeps real carbs/fats") {
    val food = res.table("dim_fooditem")
    assert(food.count() == 3) // dup oats + null name dropped
    val oats = food.filter(col("food_name") === "oats").head()
    assert(oats.getAs[Double]("fats") == 6.9) // "6.9g" stripped
    assert(oats.getAs[Double]("carbs") == 66.3)
    val salmon = food.filter(col("food_name") === "salmon").head()
    assert(salmon.isNullAt(salmon.fieldIndex("fiber"))) // "garbage" → null
  }

  test("seeded nutrition log is deterministic and FK-clean") {
    val a = res.table("fact_nutritionlog")
    val b = Pipeline.run(spark, Pipeline.demoInputs(spark), None)
      .table("fact_nutritionlog")
    assert(a.collect().toSeq == b.collect().toSeq)
    assert(a.count() == 200)
    assert(a.join(res.table("dim_fooditem"), Seq("food_key"), "left_anti")
      .count() == 0)
  }

  test("written warehouse partitions date-keyed facts by date_key") {
    val dir = java.nio.file.Files.createTempDirectory("wh_out").toString
    Pipeline.run(spark, Pipeline.demoInputs(spark), Some(dir)).unpersist()
    val sub = new java.io.File(s"$dir/fact_healthmetric").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(sub.nonEmpty && sub.forall(_.startsWith("date_key=")), sub)
    val back = spark.read.parquet(s"$dir/fact_healthmetric")
    assert(back.count() == res.table("fact_healthmetric").count())
    // a date filter now reads only that partition's directory
    val firstKey = sub.head.stripPrefix("date_key=").toLong
    assert(back.filter(col("date_key") === firstKey).count() ==
      res.table("fact_healthmetric")
        .filter(col("date_key") === firstKey).count())
  }

  test("clean build scores 100; planted violations lower the score") {
    assert(res.report.score == 100.0)
    assert(res.report.results.forall(_.violations == 0))
    // break a fact: point half the snapshot rows at a missing user
    val broken = res.tables.toMap + ("fact_usersnapshot" ->
      res.table("fact_usersnapshot")
        .withColumn("user_key",
          when(col("snapshot_key") % 2 === 0, lit(999999))
            .otherwise(col("user_key"))))
    val rep = Quality.runSuite(Pipeline.qualityRules(broken))
    assert(rep.score <= 95.0)
    assert(rep.results.exists(r =>
      r.rule.startsWith("ORPHAN fact_usersnapshot.user_key") &&
        r.violations > 0))
  }
}
