package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level transform library (SURVEY.md §2.2 T1–T13), the reusable
  * building blocks behind both the query surface and the warehouse
  * builder. All pure `Column` expressions → whole-stage codegen; no UDFs.
  *
  * Reference semantics (cited per function) from
  * /root/reference/main_etl_pipeline.py; re-expressed, not translated.
  */
object Normalize {

  /** T1 — column-name normalization: lowercase, spaces→underscores
    * (main_etl_pipeline.py:177,241). `weight (kg)` → `weight_(kg)`. */
  def columns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** T3 — unit-stripping numeric cast (main_etl_pipeline.py:394-437):
    * strips a trailing g/mg/mcg/IU/kcal unit and coerces to double,
    * null on garbage (pandas errors='coerce' ≡ try_cast). */
  def stripUnitCast(c: Column): Column =
    regexp_replace(trim(c), "(?i)\\s*(g|mg|mcg|iu|kcal)$", "")
      .try_cast(org.apache.spark.sql.types.DoubleType)

  /** T4 — range-validity nulling (main_etl_pipeline.py:202-208): values
    * outside (lo, hi) exclusive become null. */
  def nullOutsideRange(c: Column, lo: Double, hi: Double): Column =
    when(c > lo && c < hi, c)

  /** T5 — keyword classifier with first-match-wins taxonomy order
    * (main_etl_pipeline.py:314-323; taxonomy shape of config.py:30-35). */
  def keywordClassify(c: Column, taxonomy: Seq[(String, Seq[String])],
      fallback: String): Column = {
    val lowered = lower(c)
    taxonomy.foldLeft(Option.empty[Column]) { case (acc, (label, kws)) =>
      val hit = kws.map(k => lowered.contains(k)).reduce(_ || _)
      Some(acc.fold(when(hit, label))(_.when(hit, label)))
    }.fold(lit(fallback))(_.otherwise(fallback))
  }

  /** The reference's goal taxonomy, mirrored exactly — labels, keyword
    * lists, and dict order (config.py:30-35 FITNESS_GOALS; order matters
    * for first-match-wins). */
  val goalTaxonomy: Seq[(String, Seq[String])] = Seq(
    "lose_weight" -> Seq("lose", "weight loss", "fat loss", "cut"),
    "build_muscle" -> Seq("muscle", "strength", "hypertrophy", "build",
      "gain"),
    "endurance" -> Seq("endurance", "cardio", "running", "cycling",
      "marathon"),
    "maintain_health" -> Seq("maintain", "health", "wellness", "balance"))

  /** T6 — text-blob tokenizer (main_etl_pipeline.py:129-135): lowercase,
    * split on comma/newline/" and ", trim, drop empties. */
  def tokenizeBlob(c: Column): Column =
    filter(
      transform(split(lower(c), "[,\\n]| and "), t => trim(t)),
      t => t =!= "")

  /** T8 — boolean yes/no flags → condition list string
    * (main_etl_pipeline.py:195-200). */
  def flagsToList(flags: Seq[(Column, String)]): Column =
    concat_ws(", ", flags.map { case (cond, label) =>
      when(cond, label)
    }: _*)

  /** Yes/No string → boolean (main_etl_pipeline.py:196-199). */
  def yesNo(c: Column): Column = lower(trim(c)) === "yes"

  /** T11 — US-format date parse (`3/12/2016 12:00:00 AM`,
    * main_etl_pipeline.py:542,558,574,598). */
  def parseUsTimestamp(c: Column): Column =
    to_timestamp(c, "M/d/yyyy h:mm:ss a")
  def parseUsDate(c: Column): Column = to_date(c, "M/d/yyyy")

  /** T12 — date-part bundle for the date dimension
    * (main_etl_pipeline.py:349-355). `weekday0` keeps the pandas Mon=0
    * convention (Spark's dayofweek is Sun=1). */
  def withDateParts(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("date_key",
        date_format(col(dateCol), "yyyyMMdd").cast("int"))
      .withColumn("year", year(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .withColumn("month_name", date_format(col(dateCol), "MMMM"))
      .withColumn("quarter", quarter(col(dateCol)))
      .withColumn("day_name", date_format(col(dateCol), "EEEE"))
      .withColumn("weekday0", expr(s"weekday($dateCol)"))
}
