package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Cross-run ETL report drift — the check the reference's report
  * history implies but never runs: `generate_summary_report`
  * (main_etl_pipeline.py:926-945) writes one `etl_report_*.json` per
  * run and `output/` accumulates them (13 real runs ship with the
  * reference), but nothing compares consecutive runs. This operator
  * loads the whole history, unpivots every numeric metric
  * (`total_users_mapped` + each `validation_results` entry), and
  * emits run-over-run drift per metric with regression flags — the
  * reference's own history contains a real one (Dim_User_count
  * 15597 → 3571 between 2025-10-23 and 2025-10-24).
  *
  * Scale shape: one multiLine JSON scan over the report glob (even
  * thousands of runs is tiny — reports are per-run scalars), one lag
  * window per metric. Metrics that appear or disappear between runs
  * (the real history does both: Fact_NutritionLog_count exists in one
  * run, later runs have empty validation_results) stay visible as
  * rows with NULL value/prev instead of silently joining away.
  */
object ReportHistory {

  /** Long-form report history: one row per (run, metric). */
  def metrics(spark: SparkSession, reportsDir: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true")
      .json(s"$reportsDir/etl_report_*.json")
    val vrFields = raw.schema.find(_.name == "validation_results")
      .map(_.dataType) match {
      case Some(s: StructType) => s.fieldNames.toSeq
      case _ => Seq.empty[String]
    }
    val metricStructs =
      struct(lit("total_users_mapped").as("metric"),
        col("total_users_mapped").cast("long").as("value")) +:
        vrFields.map(f => struct(lit(f).as("metric"),
          col(s"validation_results.`$f`").cast("long").as("value")))
    raw.select(col("etl_timestamp").cast("string").as("run_ts"),
        explode(array(metricStructs: _*)).as("m"))
      .select(col("run_ts"), col("m.metric").as("metric"),
        col("m.value").as("value"))
  }

  /** Run-over-run drift per metric. `regressed` = the value fell by
    * more than half, or went from a real count to NULL/0 (a table
    * that stopped loading). First run of a metric has NULL prev and
    * is never flagged. */
  def drift(spark: SparkSession, reportsDir: String): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("run_ts")
    metrics(spark, reportsDir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .withColumn("delta", col("value") - col("prev"))
      .withColumn("pct_change",
        when(col("prev").isNotNull && col("prev") =!= 0,
          (col("value") - col("prev")).cast("double") /
            col("prev").cast("double")))
      .withColumn("regressed",
        col("prev").isNotNull && col("prev") > 0 &&
          (col("value").isNull ||
            col("value").cast("double") < col("prev").cast("double") * 0.5))
      .orderBy("metric", "run_ts")
  }
}
