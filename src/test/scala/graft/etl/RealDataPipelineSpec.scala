package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The decisive fidelity check: the full ETL pipeline over the
  * reference's REAL input files (the two XLSX workbooks via our OOXML
  * reader + the real CSVs), validated against the reference's own run
  * facts (etl_pipeline.log, etl_report_*.json).
  *
  * Clean-semantics deltas vs the reference run are asserted explicitly:
  * we READ mendeley's fitness_goal (the reference's row.get('fitness_goals')
  * typo forced every Mendeley user to maintain_health), so the goal dim
  * here is richer than the reference's 3 observed goals. */
class RealDataPipelineSpec extends SparkSpec {

  private val base = "/root/reference/data"
  private def exists(p: String) = new java.io.File(p).exists()

  // the exact loader Pipeline.main uses for a data-directory run
  private lazy val inputs = Pipeline.fileInputs(spark, base)

  private lazy val res = Pipeline.run(spark, inputs, None)

  test("resolves the reference's real profile corpus") {
    assume(exists(s"$base/gym_recommendation.xlsx"))
    val users = res.table("dim_user")
    val bySource = users.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // mendeley contributes 14,589 rows (etl_pipeline.log:13), gym 973;
    // the reference resolved 4,698 unique users from the same corpus
    // (etl_pipeline.log:32) — rounding-tie differences between pandas
    // round and format_number can shift the split by a handful, so the
    // assertion is a corridor around the reference's number
    val resolved = bySource.getOrElse("mendeley", 0L) +
      bySource.getOrElse("gym", 0L)
    assert(resolved >= 3500 && resolved <= 5500, s"resolved=$resolved")
    // every fitbit id becomes its own user (daily + weight log ids)
    val nFitbit = bySource.getOrElse("fitbit", 0L)
    assert(nFitbit >= 30 && nFitbit <= 40, s"fitbit=$nFitbit")
    // total unique users reproduce the reference's own resolution count
    // (etl_pipeline.log:32 / etl_report: 4,698 from 15,597 row-mappings)
    assert(users.count() == 4698L)
    // user keys are dense 1..N — no duplicates, no gaps
    assert(users.agg(max("user_key")).head().getLong(0) == users.count())
    assert(users.select("user_key").distinct().count() == users.count())
  }

  test("clean semantics read the real Mendeley goals (reference bug fixed)") {
    assume(exists(s"$base/gym_recommendation.xlsx"))
    val goals = res.table("dim_fitnessgoal").select("goal_name")
      .collect().map(_.getString(0)).toSet
    // the real 'Fitness Goal' column holds 'Weight Gain'/'Weight Loss' →
    // build_muscle (gain) and lose_weight both appear; the reference's
    // run saw neither from Mendeley (its column-name typo, SURVEY §1.4)
    assert(goals.contains("lose_weight"))
    assert(goals.contains("build_muscle"))
  }

  test("food dim carries the real nutrition corpus with real macros") {
    assume(exists(s"$base/nutrition.xlsx"))
    val food = res.table("dim_fooditem")
    // 8,789 source rows (etl_pipeline.log:15), minus duplicate names
    assert(food.count() >= 8000 && food.count() <= 8789)
    // clean semantics: carbs/fats are REAL values (reference emitted 0s
    // through its missing-column .get default, SURVEY §1.4)
    assert(food.filter(col("carbs") > 0).count() > 4000)
    assert(food.filter(col("fats") > 0).count() > 4000)
  }

  test("workout sessions match the active-row count of the real file") {
    assume(exists(s"$base/fitbit/dailyActivity_merged.csv"))
    val sess = res.table("fact_workoutsession")
    // exactly the input rows with VeryActive+FairlyActive minutes > 0
    // (all ids and dates resolve — fitbit users/dim_date cover them)
    val expected = inputs.dailyActivity.get
      .filter(col("VeryActiveMinutes") + col("FairlyActiveMinutes") > 0)
      .count()
    assert(sess.count() == expected, s"sessions=${sess.count()}")
    assert(sess.filter(col("active_minutes") <= 0).count() == 0)
  }

  test("hourly fact rolls up the real 24k-row hourlyCalories file") {
    assume(exists(s"$base/fitbit/hourlyCalories_merged.csv"))
    val h = res.table("fact_hourlyactivity")
    // 24,084 source rows are already hourly-unique per user → grain
    // count equals the (dateable, resolvable) row count
    val n = h.count()
    assert(n > 20000 && n <= 24084, s"hourly rows=$n")
    assert(h.filter(col("hour_of_day") < 0 || col("hour_of_day") > 23)
      .count() == 0)
    // FK-clean against the user dim
    assert(h.join(res.table("dim_user"), Seq("user_key")).count() == n)
  }

  test("quality suite passes on the real corpus") {
    assume(exists(s"$base/gym_recommendation.xlsx"))
    // no PK/FK/NULL issues by construction; range warnings allowed
    // (real data may contain out-of-corridor ages)
    assert(res.report.issues == 0, res.report.results.mkString("\n"))
    assert(res.report.score >= 95.0)
  }

  test("the real validation.sql corpus runs against the real warehouse") {
    val script = "/root/reference/validation.sql"
    assume(exists(script) && exists(s"$base/gym_recommendation.xlsx"))
    val out = ValidationCorpus.run(spark,
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(script))), res.tables)
    assert(out.failed.isEmpty,
      out.failed.map { case (s0, e) => s"$s0 => $e" }.mkString("\n"))
    assert(out.executed == out.statements)
    // hard classes (PK/ORPHAN/NULL) must be clean on the real build;
    // informative range rules may warn on real-world outliers
    assert(out.issues.isEmpty, out.issues.mkString("\n"))
    assert(out.score >= 95.0)
    assert(out.tableCounts.values.sum > 40000L) // a real-sized warehouse
  }
}
