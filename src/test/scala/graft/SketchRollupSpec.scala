package graft

import org.apache.spark.sql.functions._

/** The sketch-rollup algebra behind q38: HLL union is a register-max
  * merge, so merging per-day sketches to month grain must equal
  * sketching the month directly — that identity is what lets a
  * warehouse persist day sketches once and serve every coarser grain
  * without re-scanning raw data. Also pins the accuracy bar vs exact
  * COUNT(DISTINCT).
  */
class SketchRollupSpec extends SparkSpec {

  test("merged day sketches == direct month sketch, within 5% of exact") {
    val ev = Tables.events(spark, sf).select(
      date_trunc("month", col("ts")).as("month"),
      to_date(col("ts")).as("day"), col("user_id"))

    val merged = ev.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("est"))
    val exact = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("n"))

    val m = merged.collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val dct = direct.collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val ex = exact.collect().map(r => r.get(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty && m.keySet == dct.keySet && m.keySet == ex.keySet)
    m.foreach { case (month, est) =>
      assert(est == dct(month),
        s"$month: merged $est != direct ${dct(month)} — union must be " +
          "exactly the register-max merge")
      val err = math.abs(est.toDouble - ex(month)) / ex(month).toDouble
      assert(err <= 0.05, s"$month: estimate $est vs exact " +
        s"${ex(month)} (err $err)")
    }
  }

  test("x72 count-min: one-sided guarantee holds, bound rarely missed") {
    val rows = SparkEntry.defs.find(_.name == "x72_cms_frequency").get
      .run(spark, sf).collect()
    assert(rows.length > 10)
    // est >= exact is the CMS HARD guarantee — hash collisions only
    // ever ADD counts. A single negative err is an implementation bug.
    rows.foreach { r =>
      val err = r.getAs[Long]("err")
      assert(err >= 0, s"${r.getAs[String]("tok")}: est < exact ($err)")
    }
    // the 4N/w bound fails with per-token probability ≤ 4^-4 = 1/256;
    // allow 5% of the ≤100-token audit slice before calling it broken
    val viol = rows.count(_.getAs[Long]("within_bound") == 0L)
    assert(viol <= rows.length / 20,
      s"$viol of ${rows.length} audited tokens exceed the 4N/w bound")
  }
}
