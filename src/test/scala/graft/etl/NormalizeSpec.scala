package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("T1 column normalization lowercases and underscores") {
    val df = Seq((1, 2.0)).toDF("Weight (kg)", "Height M")
    assert(Normalize.columns(df).columns.toSeq ==
      Seq("weight_(kg)", "height_m"))
  }

  test("T3 unit-strip cast handles suffixes, plain numbers, garbage") {
    val df = Seq("0.1g", "9.00 mg", "0.00 IU", "12.5", "100 kcal", "N/A", "")
      .toDF("raw")
    val got = df.select(Normalize.stripUnitCast($"raw").as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(0.1), Some(9.0), Some(0.0), Some(12.5),
      Some(100.0), None, None))
  }

  test("T4 range nulling is exclusive-bounds") {
    val df = Seq(9.9, 10.0, 25.0, 60.0, 61.0).toDF("bmi")
    val got = df.select(Normalize.nullOutsideRange($"bmi", 10, 60).as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(None, None, Some(25.0), None, None))
  }

  test("T5 keyword classifier is first-match-wins with fallback") {
    val df = Seq("Weight Loss program", "muscle GAIN", "cardio blast",
      "nothing here", "lose weight gain muscle").toDF("t")
    val got = df.select(Normalize.keywordClassify($"t",
      Normalize.goalTaxonomy, "maintain_health").as("g"))
      .collect().map(_.getString(0))
    // last row matches both lose_weight and build_muscle → first wins
    assert(got.toSeq == Seq("lose_weight", "build_muscle", "endurance",
      "maintain_health", "lose_weight"))
  }

  test("T6 tokenizer splits on comma/newline/' and ', trims, drops empty") {
    val df = Seq("Carrots, Sweet Potato, and Lettuce\nRed meats and fish,,")
      .toDF("blob")
    val got = df.select(Normalize.tokenizeBlob($"blob").as("ts"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("carrots", "sweet potato", "lettuce", "red meats",
      "fish"))
  }

  test("T8 flags to list skips false flags") {
    val df = Seq(("Yes", "No"), ("Yes", "Yes"), ("No", "No"))
      .toDF("hyp", "dia")
    val got = df.select(Normalize.flagsToList(Seq(
      Normalize.yesNo($"hyp") -> "hypertension",
      Normalize.yesNo($"dia") -> "diabetes")).as("c"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("hypertension", "hypertension, diabetes", ""))
  }

  test("T11 US timestamp/date parse") {
    val df = Seq(("3/12/2016 12:00:00 AM", "3/25/2016")).toDF("ts", "d")
    val r = df.select(
      Normalize.parseUsTimestamp($"ts").cast("string").as("ts"),
      Normalize.parseUsDate($"d").cast("string").as("d")).collect()(0)
    assert(r.getString(0) == "2016-03-12 00:00:00")
    assert(r.getString(1) == "2016-03-25")
  }

  test("T12 date parts match pandas conventions (Mon=0 weekday)") {
    val df = Seq("2016-03-12").toDF("s")
      .select(to_date($"s").as("d"))
    val r = Normalize.withDateParts(df, "d").collect()(0)
    assert(r.getAs[Int]("date_key") == 20160312)
    assert(r.getAs[Int]("year") == 2016)
    assert(r.getAs[String]("month_name") == "March")
    assert(r.getAs[String]("day_name") == "Saturday")
    assert(r.getAs[Int]("weekday0") == 5) // Saturday, Mon=0
  }
}
