package graft.etl

import graft.sources.Sources
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1 — end-to-end ETL orchestration, the Spark re-expression of the
  * reference's `run_full_etl_pipeline` (main_etl_pipeline.py:947-976):
  * extract → transform (staging → dims → bridges → facts) → ordered load
  * → validate → JSON report, over FIXTURES.md-shaped inputs.
  *
  * Clean-semantics build (SURVEY.md §1.4): the reference's column-name
  * bugs are NOT reproduced — mendeley `fitness_goal`/`exercises` are
  * actually read, `Dim_FoodItem` carries real carbs/fats
  * (nutrition `carbohydrate`/`total_fat`), and `Fact_NutritionLog` is
  * seeded (deterministic), not unseeded np.random.
  *
  * Scale stance: every stage is a lazy DataFrame program — entity
  * resolution is one hash shuffle (EntityResolution), surrogate keys are
  * two-phase distributed numbering (mintKeys), dimension lookups
  * broadcast only the genuinely small sides (static dims, date dim), and
  * the user-mapping join is left to AQE (it grows with the user count).
  */
object Pipeline {

  /** Optional raw inputs, shaped per FIXTURES.md §1-4 (column names are
    * normalized internally, so callers can pass raw headers). */
  final case class Inputs(
      mendeley: Option[DataFrame] = None,
      gym: Option[DataFrame] = None,
      dailyActivity: Option[DataFrame] = None,
      weightLog: Option[DataFrame] = None,
      sleep: Option[DataFrame] = None,
      heartrate: Option[DataFrame] = None,
      nutrition: Option[DataFrame] = None,
      hourlyCalories: Option[DataFrame] = None)

  final case class Result(tables: Seq[(String, DataFrame)],
      report: Quality.Report,
      private[etl] val cached: Seq[DataFrame] = Nil) {
    def table(name: String): DataFrame =
      tables.find(_._1 == name)
        .getOrElse(sys.error(s"no table $name"))._2
    /** Release the canonical-profile cache held for the run. */
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  private val noText = lit(null).cast("string")

  /** Staging profile contract shared by the three sources
    * (main_etl_pipeline.py:161-312). */
  private def mendeleyProfiles(raw: DataFrame): DataFrame = {
    val d = Normalize.columns(raw)
    d.select(
      lit("mendeley").as("source"), lit(1).as("src_priority"),
      concat(lit("mendeley_"), col("id").cast("string")).as("original_id"),
      col("age").cast("int").as("age"),
      lower(trim(col("sex"))).as("gender"),
      col("height").cast("double").as("height"),
      col("weight").cast("double").as("weight"),
      Normalize.nullOutsideRange(col("bmi").cast("double"), 10, 60).as("bmi"),
      col("fitness_goal").as("goal_text"),
      col("fitness_type").as("type_name"),
      noText.as("experience_level"),
      Normalize.flagsToList(Seq(
        Normalize.yesNo(col("hypertension")) -> "hypertension",
        Normalize.yesNo(col("diabetes")) -> "diabetes"))
        .as("conditions_blob"),
      col("exercises").as("exercises_blob"),
      col("diet").as("diet_blob"))
  }

  private def gymProfiles(raw: DataFrame): DataFrame = {
    val d = Normalize.columns(raw)
    // gym rows carry no natural id (the reference keys them by row
    // index); a content hash is the deterministic, distributed analogue
    // — full-duplicate rows collapse, which the ER dedup does anyway.
    d.select(
      lit("gym").as("source"), lit(2).as("src_priority"),
      concat(lit("gym_"),
        abs(xxhash64(d.columns.map(col).toIndexedSeq: _*)).cast("string"))
        .as("original_id"),
      col("age").cast("int").as("age"),
      lower(trim(col("gender"))).as("gender"),
      col("height_(m)").cast("double").as("height"),
      col("weight_(kg)").cast("double").as("weight"),
      Normalize.nullOutsideRange(col("bmi").cast("double"), 10, 60).as("bmi"),
      col("workout_type").as("goal_text"),
      col("workout_type").as("type_name"),
      col("experience_level").cast("string").as("experience_level"),
      noText.as("conditions_blob"),
      noText.as("exercises_blob"),
      noText.as("diet_blob"))
  }

  private def fitbitProfiles(frames: Seq[DataFrame]): Option[DataFrame] =
    frames.map(f => Normalize.columns(f).select(col("id").cast("long")
        .as("id")))
      .reduceOption(_ unionByName _)
      .map(_.distinct().select(
        lit("fitbit").as("source"), lit(3).as("src_priority"),
        concat(lit("fitbit_"), col("id").cast("string")).as("original_id"),
        lit(null).cast("int").as("age"), noText.as("gender"),
        lit(null).cast("double").as("height"),
        lit(null).cast("double").as("weight"),
        lit(null).cast("double").as("bmi"),
        noText.as("goal_text"), noText.as("type_name"),
        noText.as("experience_level"), noText.as("conditions_blob"),
        noText.as("exercises_blob"), noText.as("diet_blob")))

  /** Run the full pipeline. Returns the 19 warehouse tables in
    * dependency (load) order plus the quality report; writes them (and
    * the JSON report) if `outDir` is given. */
  def run(spark: SparkSession, in: Inputs, outDir: Option[String] = None,
      seed: Long = 42L, nutritionLogs: Int = 200): Result = {
    // ---- extract/stage ------------------------------------------------
    val sources = Seq(
      in.mendeley.map(mendeleyProfiles),
      in.gym.map(gymProfiles),
      fitbitProfiles(Seq(in.dailyActivity, in.weightLog, in.sleep,
        in.heartrate, in.hourlyCalories).flatten)).flatten
    require(sources.nonEmpty, "no profile sources")
    val staged = sources.reduce(_ unionByName _)

    // ---- entity resolution (J1/J3) ------------------------------------
    // fitbit rows have no physical profile → keyed by original id, like
    // the reference's fitbit_{id} mapping entries
    val hashCol = when(col("source") === "fitbit", col("original_id"))
      .otherwise(EntityResolution.profileHash(col("age"), col("gender"),
        col("height"), col("weight")))
    val (canonical0, mapping) = EntityResolution.resolve(
      staged, hashCol, col("src_priority"), col("original_id"))
    // canonical profiles feed every dim/bridge/fact AND the quality
    // rules — persist once instead of re-running the resolution shuffle
    // per consumer (at scale this is the checkpoint you'd take anyway)
    val canonical = canonical0.withColumn("goal_name",
      Normalize.keywordClassify(coalesce(col("goal_text"), lit("")),
        Normalize.goalTaxonomy, "maintain_health")).persist()
    val userMap = mapping.select("original_id", "user_key").persist()

    // ---- dimensions ---------------------------------------------------
    val dimDate = Warehouse.dimDate(spark, "2016-01-01", "2025-12-31")
      .select(col("date_key"), col("full_date"),
        col("weekday0").as("day_of_week"), col("day_name"),
        col("month"), col("month_name"), col("quarter"), col("year"))
    val dimUser = canonical.select(col("user_key"), col("source"),
      col("original_id"), col("age"), col("gender"),
      col("experience_level"), noText.as("activity_level"))
    val dimGoal = Warehouse.dimFromDistinct(canonical, "goal_name",
      "goal_key", "goal_name")
    val dimType = Warehouse.dimFromDistinct(canonical, "type_name",
      "type_key", "type_name")
    val dimWorkoutType = Warehouse.dimFromDistinct(
      canonical.filter(col("source") === "gym"), "type_name",
      "workout_type_key", "workout_name")
    val dimCondition = Warehouse.dimFromBlob(canonical, "conditions_blob",
      "condition_key", "condition_name")
    val dimExercise = Warehouse.dimFromBlob(canonical, "exercises_blob",
      "exercise_key", "exercise_name")
    val dimDiet = Warehouse.dimFromBlob(canonical, "diet_blob",
      "diet_key", "diet_name")
    val dimMetricType = spark.createDataFrame(Seq(
      (1, "heart_rate", "bpm"), (2, "sleep", "hours"),
      (3, "weight", "kg"), (4, "bmi", "index")))
      .toDF("metric_type_key", "metric_name", "unit")
    val dimMealType = spark.createDataFrame(Seq(
      (1, "breakfast"), (2, "lunch"), (3, "dinner"), (4, "snack")))
      .toDF("meal_type_key", "meal_name")
    val dimFood = in.nutrition.map { raw =>
      val n = Normalize.columns(raw)
      EntityResolution.mintKeys(
        n.na.drop(Seq("name")).dropDuplicates("name")
          .select(col("name").as("food_name"),
            noText.as("food_category"),
            Normalize.stripUnitCast(col("calories")).as("calories"),
            Normalize.stripUnitCast(col("protein")).as("protein"),
            Normalize.stripUnitCast(col("carbohydrate")).as("carbs"),
            Normalize.stripUnitCast(col("total_fat")).as("fats"),
            Normalize.stripUnitCast(col("fiber")).as("fiber")),
        "food_key", col("food_name"))
        .select("food_key", "food_name", "food_category", "calories",
          "protein", "carbs", "fats", "fiber")
    }.getOrElse(spark.createDataFrame(Seq.empty[(Int, String, String,
      Double, Double, Double, Double, Double)])
      .toDF("food_key", "food_name", "food_category", "calories",
        "protein", "carbs", "fats", "fiber"))

    // ---- bridges ------------------------------------------------------
    val bCondition = Warehouse.bridgeFromBlob(canonical, "user_key",
      "conditions_blob", dimCondition, "condition_key", "condition_name")
    val bWorkout = Warehouse.bridgeFromBlob(canonical, "user_key",
      "exercises_blob", dimExercise, "exercise_key", "exercise_name")
    val bDiet = Warehouse.bridgeFromBlob(canonical, "user_key",
      "diet_blob", dimDiet, "diet_key", "diet_name")

    // ---- facts --------------------------------------------------------
    val factSnapshot = EntityResolution.mintKeys(
      canonical
        .join(broadcast(dimGoal), Seq("goal_name"))
        .join(broadcast(dimType), Seq("type_name"), "left"),
      "snapshot_key", col("user_key"))
      .select("snapshot_key", "user_key", "goal_key", "type_key",
        "height", "weight", "bmi")

    val dateKeys = broadcast(dimDate.select("date_key", "full_date"))

    val factSession = in.dailyActivity.map { raw =>
      val act = Normalize.columns(raw)
        .withColumn("full_date", Normalize.parseUsDate(col("activitydate")))
        .withColumn("active_minutes",
          col("veryactiveminutes") + col("fairlyactiveminutes"))
        .filter(col("active_minutes") > 0)
        .withColumn("original_id",
          concat(lit("fitbit_"), col("id").cast("string")))
      EntityResolution.mintKeys(
        act.join(userMap, Seq("original_id")) // inner: unmapped dropped
          .join(dateKeys, Seq("full_date")),
        "session_key", col("original_id"), col("date_key"))
        .select(col("session_key"), col("user_key"), col("date_key"),
          lit(null).cast("int").as("workout_type_key"),
          round(col("active_minutes") / 60.0, 2).as("duration_hours"),
          col("calories").cast("int").as("calories_burned"),
          col("totalsteps").cast("int").as("total_steps"),
          col("totaldistance").cast("double").as("total_distance"),
          col("active_minutes").cast("int").as("active_minutes"),
          lit(null).cast("int").as("frequency_per_week"))
    }.getOrElse(spark.emptyDataFrame)

    val metricSources = Seq(
      in.sleep.map { raw => // A1: minutes summed per (id, day) → hours
        Normalize.columns(raw)
          .groupBy(col("id"),
            to_date(Normalize.parseUsTimestamp(col("date"))).as("full_date"))
          .agg((sum(col("value")) / 60.0).as("value"))
          .withColumn("metric_name", lit("sleep"))
      },
      in.heartrate.map { raw => // A2: mean per (id, day)
        Normalize.columns(raw)
          .groupBy(col("id"),
            to_date(Normalize.parseUsTimestamp(col("time"))).as("full_date"))
          .agg(avg(col("value")).as("value"))
          .withColumn("metric_name", lit("heart_rate"))
      },
      in.weightLog.map { raw => // A3: unpivot weight + bmi rows
        val w = Normalize.columns(raw)
          .withColumn("full_date",
            to_date(Normalize.parseUsTimestamp(col("date"))))
          .withColumn("bmi_valid",
            Normalize.nullOutsideRange(col("bmi").cast("double"), 10, 60))
        Warehouse.unpivotMetrics(w, Seq("id", "full_date"),
          Seq("weight" -> "weightkg", "bmi" -> "bmi_valid"))
          .withColumnRenamed("metric", "metric_name")
      }).flatten

    val factMetric = metricSources.reduceOption(_ unionByName _)
      .map { m =>
        EntityResolution.mintKeys(
          m.filter(col("value").isNotNull)
            .withColumn("original_id",
              concat(lit("fitbit_"), col("id").cast("string")))
            .join(userMap, Seq("original_id"))
            .join(dateKeys, Seq("full_date"))
            .join(broadcast(dimMetricType), Seq("metric_name")),
          "metric_key", col("original_id"), col("date_key"),
          col("metric_name"))
          .select(col("metric_key"), col("user_key"), col("date_key"),
            col("metric_type_key"), round(col("value"), 2).as("value"),
            col("unit"))
      }.getOrElse(spark.emptyDataFrame)

    // T16 — seeded synthetic nutrition log (the reference's unseeded
    // np.random demo generator, made deterministic): LCG streams off the
    // row id pick user/date/meal/food/serving.
    val nUsers = canonical.count()
    val nFoods = dimFood.count()
    val factNutrition =
      if (nFoods == 0L || nUsers == 0L) spark.emptyDataFrame
      else {
        def lcg(k: Int): Column = pmod(
          (col("id") + lit(seed)) * lit(1103515245L + 2531011L * k) +
            lit(12345L * (k + 1)), lit(2147483647L))
        val logs = spark.range(nutritionLogs.toLong)
          .withColumn("user_key", (pmod(lcg(1), lit(nUsers)) + 1)
            .cast("int"))
          .withColumn("full_date", date_add(lit("2016-03-01").cast("date"),
            pmod(lcg(2), lit(30)).cast("int")))
          .withColumn("meal_type_key", (pmod(lcg(3), lit(4)) + 1)
            .cast("int"))
          .withColumn("food_key", (pmod(lcg(4), lit(nFoods)) + 1)
            .cast("int"))
          .withColumn("serving_size",
            round((pmod(lcg(5), lit(300)) + 50) / 100.0, 2))
        EntityResolution.mintKeys(
          logs.join(dateKeys, Seq("full_date"))
            .join(broadcast(dimFood), Seq("food_key")),
          "log_key", col("id"))
          .select(col("log_key"), col("user_key"), col("date_key"),
            col("meal_type_key"), col("food_key"), col("serving_size"),
            round(coalesce(col("calories"), lit(0.0)) * col("serving_size"),
              2).as("total_calories"),
            round(coalesce(col("protein"), lit(0.0)) * col("serving_size"),
              2).as("total_protein"),
            round(coalesce(col("carbs"), lit(0.0)) * col("serving_size"),
              2).as("total_carbs"),
            round(coalesce(col("fats"), lit(0.0)) * col("serving_size"),
              2).as("total_fats"))
      }

    // Hourly-grain activity fact — EXCEEDS the reference: it extracts
    // hourlyCalories_merged.csv and then never transforms it
    // (main_etl_pipeline.py:64, SURVEY §1.3). One groupBy to the
    // user-hour grain; at scale this is the partition-pruned,
    // pre-aggregated rollup the daily fact can't answer.
    val factHourly = in.hourlyCalories.map { raw =>
      val h = Normalize.columns(raw)
        .withColumn("ts", Normalize.parseUsTimestamp(col("activityhour")))
        .withColumn("full_date", to_date(col("ts")))
        .withColumn("original_id",
          concat(lit("fitbit_"), col("id").cast("string")))
      val hourly = h.join(userMap, Seq("original_id"))
        .join(dateKeys, Seq("full_date"))
        .groupBy(col("user_key"), col("date_key"),
          hour(col("ts")).as("hour_of_day"))
        .agg(sum(col("calories")).cast("int").as("calories"))
      EntityResolution.mintKeys(hourly, "hourly_key",
        col("user_key"), col("date_key"), col("hour_of_day"))
        .select("hourly_key", "user_key", "date_key", "hour_of_day",
          "calories")
    }.getOrElse(spark.emptyDataFrame)

    // ---- load order: Dims → Bridges → Facts (main_etl_pipeline.py:752)
    // NOT persisted: each table has two driving consumers (validation
    // + sink), but a full-warehouse persist measured SLOWER end to end
    // at reference scale (warm 8.7 → 9.8 s — materialization cost >
    // the saved recompute behind the already-persisted canonical
    // profiles); on a cluster with expensive upstream stages the
    // stage-boundary cache may win — re-measure there, don't assume.
    val tables: Seq[(String, DataFrame)] = Seq(
      "dim_date" -> dimDate,
      "dim_user" -> dimUser,
      "dim_fitnessgoal" -> dimGoal,
      "dim_fitnesstype" -> dimType,
      "dim_healthcondition" -> dimCondition,
      "dim_exercise" -> dimExercise,
      "dim_diet" -> dimDiet,
      "dim_fooditem" -> dimFood,
      "dim_metrictype" -> dimMetricType,
      "dim_mealtype" -> dimMealType,
      "dim_workouttype" -> dimWorkoutType,
      "bridge_user_healthcondition" -> bCondition,
      "bridge_user_workoutpreference" -> bWorkout,
      "bridge_user_dietpreference" -> bDiet,
      "fact_usersnapshot" -> factSnapshot,
      "fact_workoutsession" -> factSession,
      "fact_healthmetric" -> factMetric,
      "fact_nutritionlog" -> factNutrition,
      "fact_hourlyactivity" -> factHourly)

    // ---- validate (Q2/Q3/Q4/Q6 classes) + score -----------------------
    val tValidate0 = System.nanoTime()
    val report = Quality.runSuite(qualityRules(tables.toMap))
    val tValidate = (System.nanoTime() - tValidate0) / 1e9

    val tWrite0 = System.nanoTime()
    outDir.foreach { dir =>
      // date-keyed facts land hive-partitioned by date_key: time-window
      // queries over the written warehouse prune to the touched days
      // (the layout the reference's date indexes approximate). Cluster
      // rows by the partition key BEFORE the write — without it every
      // task emits one file per date it happens to hold (measured:
      // 1,624 files for a 25k-row warehouse, 987 in hourlyactivity
      // alone — metadata poison at scale and a third of the warm ETL
      // wall at reference scale); with it the file count is O(dates).
      val datePart = Set("fact_workoutsession", "fact_healthmetric",
        "fact_nutritionlog", "fact_hourlyactivity")
      Sources.writeOrdered(
        tables.filter(_._2.columns.nonEmpty).map { case (n, df) =>
          n -> (if (datePart(n))
            df.repartition(org.apache.spark.sql.functions.col("date_key"))
          else df)
        }, dir,
        partitions = datePart.map(_ -> Seq("date_key")).toMap)
      Sources.writeJsonReport(Quality.toJson(report), s"$dir/etl_report.json")
    }
    val tWrite = (System.nanoTime() - tWrite0) / 1e9
    System.err.println(
      f"[etl-phase] validate=$tValidate%.1fs write=$tWrite%.1fs")
    Result(tables, report, Seq(canonical, userMap))
  }

  /** The validation.sql rule classes instantiated over the built
    * warehouse (PK uniqueness, FK orphans, NULL and range rules —
    * validation.sql:49-291). */
  def qualityRules(t: Map[String, DataFrame])
      : Seq[(Quality.Rule, DataFrame)] = {
    import Quality._
    def has(n: String) = t(n).columns.nonEmpty
    val pk = Seq(
      "dim_user" -> "user_key", "dim_date" -> "date_key",
      "dim_fitnessgoal" -> "goal_key", "dim_fooditem" -> "food_key",
      "fact_usersnapshot" -> "snapshot_key")
      .filter(p => has(p._1)).map { case (tab, k) =>
        Rule(s"PK CHECK $tab.$k", Issue, pkUniqueness(Seq(col(k)))) -> t(tab)
      }
    val bridgePk = Seq(
      ("bridge_user_healthcondition", "user_key", "condition_key"),
      ("bridge_user_dietpreference", "user_key", "diet_key"))
      .filter(p => has(p._1)).map { case (tab, a, b) =>
        Rule(s"PK CHECK $tab", Issue, pkUniqueness(Seq(col(a), col(b)))) ->
          t(tab)
      }
    val fks = Seq(
      ("fact_usersnapshot", "user_key", "dim_user", "user_key"),
      ("fact_usersnapshot", "goal_key", "dim_fitnessgoal", "goal_key"),
      ("fact_workoutsession", "user_key", "dim_user", "user_key"),
      ("fact_workoutsession", "date_key", "dim_date", "date_key"),
      ("fact_healthmetric", "user_key", "dim_user", "user_key"),
      ("fact_hourlyactivity", "user_key", "dim_user", "user_key"),
      ("fact_hourlyactivity", "date_key", "dim_date", "date_key"),
      ("fact_healthmetric", "metric_type_key", "dim_metrictype",
        "metric_type_key"),
      ("fact_nutritionlog", "food_key", "dim_fooditem", "food_key"),
      ("fact_nutritionlog", "date_key", "dim_date", "date_key"),
      ("bridge_user_healthcondition", "condition_key",
        "dim_healthcondition", "condition_key"))
      .filter(p => has(p._1) && has(p._3)).map { case (f, fk, d, k) =>
        Rule(s"ORPHAN $f.$fk→$d", Issue, fkOrphans(t(d), fk, k)) -> t(f)
      }
    val nulls = Seq(
      ("fact_usersnapshot", "user_key"), ("fact_usersnapshot", "goal_key"),
      ("fact_healthmetric", "value"))
      .filter(p => has(p._1)).map { case (tab, c) =>
        Rule(s"NULL VIOL $tab.$c", Issue, nullViolations(c)) -> t(tab)
      }
    val ranges = Seq(
      ("fact_usersnapshot", "bmi", 10.0, 60.0),
      ("dim_user", "age", 13.0, 100.0),
      ("fact_nutritionlog", "total_calories", 0.0, 10000.0),
      ("fact_hourlyactivity", "calories", 0.0, 10000.0))
      .filter(p => has(p._1)).map { case (tab, c, lo, hi) =>
        Rule(s"RANGE $tab.$c", Warning, rangeViolations(c, lo, hi)) -> t(tab)
      }
    pk ++ bridgePk ++ fks ++ nulls ++ ranges
  }

  /** Deterministic FIXTURES.md-shaped demo inputs (shared by the e2e
    * spec and [[main]]): raw headers with spaces/case, duplicate
    * profiles that must entity-resolve, a cross-source (mendeley↔gym)
    * profile match, unit-suffixed nutrition strings with garbage, an
    * out-of-range BMI, and a zero-active-minutes activity row. */
  def demoInputs(spark: SparkSession): Inputs = {
    import spark.implicits._
    val mendeley = Seq(
      (1, "Male", 30, 1.75, 80.0, "Yes", "No", 26.1, "Normal",
        "Weight Loss", "Cardio", "Squats, Lunges and Planks",
        "Dumbbells", "Vegetables: (Carrots, Sweet Potato), Protein: " +
          "(fish and poultry)", "stay consistent"),
      (2, "Female", 25, 1.60, 55.0, "No", "No", 21.5, "Normal",
        "Muscle Gain", "Strength", "Deadlifts, Bench Press",
        "Barbell", "high protein, low carb", "lift heavy"),
      // exact duplicate profile of id=1 → must dedup to one user
      (3, "Male", 30, 1.75, 80.0, "Yes", "Yes", 26.1, "Normal",
        "Weight Loss", "Cardio", "Squats", "None", "balanced diet",
        "hydrate"),
      (4, "Female", 40, 1.68, 150.0, "No", "Yes", 120.0, "Obuse",
        "endurance running", "Cardio", "Running and Cycling", "None",
        "wellness, balance", "see a doctor")) // BMI 120 → nulled
      .toDF("ID", "Sex", "Age", "Height", "Weight", "Hypertension",
        "Diabetes", "BMI", "Level", "Fitness Goal", "Fitness Type",
        "Exercises", "Equipment", "Diet", "Recommendation")
    val gym = Seq(
      // same physical profile as mendeley id=1 → cross-source match
      (30, "Male", 80.0, 1.75, 180, 140, 60, 1.5, 450.0, "Cardio", 22.0,
        2.5, 3, 2, 26.1),
      (22, "Female", 62.0, 1.70, 190, 150, 65, 1.0, 380.0, "HIIT", 18.5,
        2.0, 4, 1, 21.5))
      .toDF("Age", "Gender", "Weight (kg)", "Height (m)", "Max_BPM",
        "Avg_BPM", "Resting_BPM", "Session_Duration (hours)",
        "Calories_Burned", "Workout_Type", "Fat_Percentage",
        "Water_Intake (liters)", "Workout_Frequency (days/week)",
        "Experience_Level", "BMI")
    val daily = Seq(
      (1503960366L, "3/25/2016", 11004, 7.11, 33, 12, 205, 804, 1819),
      (1503960366L, "3/26/2016", 12000, 8.00, 40, 15, 210, 790, 1900),
      (1624580081L, "3/25/2016", 8500, 5.50, 20, 10, 180, 900, 1500),
      (1624580081L, "3/27/2016", 0, 0.0, 0, 0, 0, 1440, 1200)) // inactive
      .toDF("Id", "ActivityDate", "TotalSteps", "TotalDistance",
        "VeryActiveMinutes", "FairlyActiveMinutes", "LightlyActiveMinutes",
        "SedentaryMinutes", "Calories")
    val weight = Seq(
      (1503960366L, "4/5/2016 11:59:59 PM", 72.3, 159.4, 25.0, true, 1L),
      (1624580081L, "4/6/2016 11:59:59 PM", 65.1, 143.5, 199.0, true, 2L))
      .toDF("Id", "Date", "WeightKg", "WeightPounds", "BMI",
        "IsManualReport", "LogId") // BMI 199 → nulled, row still emits kg
    val sleep = Seq(
      (1503960366L, "3/25/2016 1:00:00 AM", 60),
      (1503960366L, "3/25/2016 2:00:00 AM", 55),
      (1624580081L, "3/26/2016 1:30:00 AM", 45))
      .toDF("Id", "date", "value")
    val hr = Seq(
      (1503960366L, "3/25/2016 7:21:00 AM", 66),
      (1503960366L, "3/25/2016 7:21:05 AM", 70),
      (1624580081L, "3/25/2016 8:00:00 AM", 80))
      .toDF("Id", "Time", "Value")
    val nutrition = Seq(
      ("oats", "100 g", "389", "6.9g", "16.9 g", "66.3", "10.6 g"),
      ("banana", "100 g", "89", "0.3g", "1.1 g", "22.8", "2.6 g"),
      ("salmon", "100 g", "208", "13 g", "20.4 g", "0", "garbage"),
      ("oats", "100 g", "389", "6.9g", "16.9 g", "66.3", "10.6 g"), // dup
      (null, "100 g", "0", "0", "0", "0", "0")) // null name → dropped
      .toDF("name", "serving_size", "calories", "total_fat", "protein",
        "carbohydrate", "fiber")
    val hourly = Seq(
      (1503960366L, "3/25/2016 1:00:00 AM", 48),
      (1503960366L, "3/25/2016 1:30:00 AM", 30), // same hour → aggregated
      (1503960366L, "3/26/2016 2:00:00 AM", 52),
      (1624580081L, "3/25/2016 9:00:00 AM", 120))
      .toDF("Id", "ActivityHour", "Calories")
    Inputs(Some(mendeley), Some(gym), Some(daily), Some(weight),
      Some(sleep), Some(hr), Some(nutrition), Some(hourly))
  }

  /** Load Inputs from a reference-layout data directory
    * (`gym_recommendation.xlsx`, `nutrition.xlsx`,
    * `gym_members_exercise_tracking.csv`, the fitbit CSVs) — missing
    * files are skipped, mirroring the reference's extract tolerance
    * (main_etl_pipeline.py:58-84). */
  def fileInputs(spark: SparkSession, base: String): Inputs = {
    import org.apache.spark.sql.types._
    def st(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t) }.toArray)
    // Declared schemas (FIXTURES.md §1-2; header names verified against
    // the reference's own files) — never inferSchema: inference reads
    // every CSV twice and guesses, and heartrate_seconds is 1M+ rows in
    // the real layout. Dates stay strings; Normalize parses them.
    val gymSchema = st("Age" -> IntegerType, "Gender" -> StringType,
      "Weight (kg)" -> DoubleType, "Height (m)" -> DoubleType,
      "Max_BPM" -> IntegerType, "Avg_BPM" -> IntegerType,
      "Resting_BPM" -> IntegerType,
      "Session_Duration (hours)" -> DoubleType,
      "Calories_Burned" -> DoubleType, "Workout_Type" -> StringType,
      "Fat_Percentage" -> DoubleType, "Water_Intake (liters)" -> DoubleType,
      "Workout_Frequency (days/week)" -> IntegerType,
      "Experience_Level" -> IntegerType, "BMI" -> DoubleType)
    val dailySchema = st("Id" -> LongType, "ActivityDate" -> StringType,
      "TotalSteps" -> IntegerType, "TotalDistance" -> DoubleType,
      "TrackerDistance" -> DoubleType,
      "LoggedActivitiesDistance" -> DoubleType,
      "VeryActiveDistance" -> DoubleType,
      "ModeratelyActiveDistance" -> DoubleType,
      "LightActiveDistance" -> DoubleType,
      "SedentaryActiveDistance" -> DoubleType,
      "VeryActiveMinutes" -> IntegerType,
      "FairlyActiveMinutes" -> IntegerType,
      "LightlyActiveMinutes" -> IntegerType,
      "SedentaryMinutes" -> IntegerType, "Calories" -> IntegerType)
    val weightSchema = st("Id" -> LongType, "Date" -> StringType,
      "WeightKg" -> DoubleType, "WeightPounds" -> DoubleType,
      "Fat" -> DoubleType, "BMI" -> DoubleType,
      "IsManualReport" -> BooleanType, "LogId" -> LongType)
    val sleepSchema = st("Id" -> LongType, "date" -> StringType,
      "value" -> IntegerType, "logId" -> LongType)
    val hrSchema = st("Id" -> LongType, "Time" -> StringType,
      "Value" -> IntegerType)
    val hourlySchema = st("Id" -> LongType, "ActivityHour" -> StringType,
      "Calories" -> IntegerType)
    def xlsx(p: String) =
      Option(new java.io.File(s"$base/$p")).filter(_.exists)
        .map(f => graft.sources.Xlsx.read(spark, f.toString))
    def csv(p: String, schema: StructType) =
      graft.sources.Sources.csv(spark, s"$base/$p", schema)
    Inputs(
      mendeley = xlsx("gym_recommendation.xlsx"),
      gym = csv("gym_members_exercise_tracking.csv", gymSchema),
      dailyActivity = csv("fitbit/dailyActivity_merged.csv", dailySchema),
      weightLog = csv("fitbit/weightLogInfo_merged.csv", weightSchema),
      sleep = csv("fitbit/minuteSleep_merged.csv", sleepSchema),
      heartrate = csv("fitbit/heartrate_seconds_merged.csv", hrSchema),
      nutrition = xlsx("nutrition.xlsx"),
      hourlyCalories = csv("fitbit/hourlyCalories_merged.csv",
        hourlySchema))
  }

  /** Runnable entry point: full ETL → `args(0)` (default
    * ./pipeline_out): 19 parquet tables in load order +
    * etl_report.json. With `args(1)` = a reference-layout data
    * directory the real files run; otherwise the demo fixtures do. */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("pipeline_out")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors)
      .config("spark.local.dir", graft.GraftSession.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new RunLog(Some(s"$out/etl_run_log.jsonl")) // S8 sink
    val inputs = args.lift(1) match {
      case Some(base) => fileInputs(spark, base)
      case None => demoInputs(spark)
    }
    val res = log.timed("run_full_etl_pipeline") {
      run(spark, inputs, Some(out))
    }
    res.tables.foreach { case (n, df) => log.stage(n, df.count()) }
    log.stage("quality_score", detail = res.report.score.toString)
    log.close()
    spark.stop()
  }
}
