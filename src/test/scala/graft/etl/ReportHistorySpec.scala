package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift over the reference's REAL 13-run report history — the facts
  * asserted here are read off the shipped etl_report_*.json files. */
class ReportHistorySpec extends SparkSpec {

  private val dir = "/root/reference/output"
  private def available = new java.io.File(dir).isDirectory

  test("metrics: every run row-ized, appearing/disappearing kept") {
    assume(available)
    val m = ReportHistory.metrics(spark, dir)
    assert(m.select("run_ts").distinct().count() == 13)
    // total_users_mapped exists in every run
    assert(m.filter(col("metric") === "total_users_mapped" &&
      col("value").isNotNull).count() == 13)
    // Fact_NutritionLog_count appears in exactly one run's
    // validation_results; the other 12 runs surface as NULL rows,
    // not dropped rows
    val nut = m.filter(col("metric") === "Fact_NutritionLog_count")
    assert(nut.count() == 13)
    assert(nut.filter(col("value").isNotNull).count() == 1)
  }

  test("drift: the real Dim_User_count regression is flagged") {
    assume(available)
    val d = ReportHistory.drift(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(0),
        Option(r.get(2)).map(_.toString.toLong),
        r.getBoolean(r.fieldIndex("regressed"))))
    // 15597 -> 3571 on 2025-10-24 (77% drop): regression flag fires
    val dim = d.filter(_._1 == "Dim_User_count")
    val reg = dim.filter(_._4)
    assert(reg.nonEmpty && reg.head._2.startsWith("2025-10-24T11:30"))
    assert(reg.head._3.contains(3571L))
    // the -10 blip in total_users_mapped (15597 -> 15587) is drift
    // but NOT a >50% regression
    val tum = d.filter(_._1 == "total_users_mapped")
    assert(tum.forall(!_._4))
    val drift = ReportHistory.drift(spark, dir)
      .filter(col("metric") === "total_users_mapped" &&
        col("delta") === -10L)
    assert(drift.count() == 1)
  }

  test("drift: first run per metric is never flagged; counts that " +
      "stopped loading are") {
    assume(available)
    val d = ReportHistory.drift(spark, dir)
    assert(d.filter(col("prev").isNull && col("regressed")).count() == 0)
    // bridge_healthcondition_count: 13502 -> 21 is a flagged collapse
    assert(d.filter(col("metric") === "bridge_healthcondition_count" &&
      col("regressed")).count() >= 1)
  }
}
