package graft.plans

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The guard is exercised directly against analyzed plans (the shared
  * test session was built without extensions; the injection wiring
  * itself is one line of GraftExtensions). */
class CartesianGuardSpec extends SparkSpec {

  private def guard(maxBytes: Long = 1024): CartesianGuard = {
    spark.conf.set("spark.graft.guard.cartesian.maxBytes",
      maxBytes.toString)
    new CartesianGuard(spark)
  }

  private def big(prefix: String): DataFrame = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"$prefix-payload-$i"))
      .toDF(s"${prefix}_id", s"${prefix}_s")
  }

  test("large x large join with no cross-side equality is refused") {
    val l = big("l"); val r = big("r")
    val unkeyed = l.join(r, l("l_id") > r("r_id"))
    val e = intercept[SparkException] {
      guard()(unkeyed.queryExecution.analyzed)
    }
    assert(e.getMessage.contains("unkeyed"))
    // the self-equality typo (l.id === l.id): both refs one side → still
    // no cross-side key → refused
    val typo = l.join(r, l("l_id") === l("l_id"))
    intercept[SparkException] { guard()(typo.queryExecution.analyzed) }
  }

  test("keyed joins and bounded-side cross joins pass") {
    import spark.implicits._
    val l = big("l"); val r = big("r")
    // equi-join: fine regardless of size
    guard()(l.join(r, l("l_id") === r("r_id")).queryExecution.analyzed)
    // equi + residual range: fine
    guard()(l.join(r, l("l_id") === r("r_id") && l("l_id") > r("r_id") - 10)
      .queryExecution.analyzed)
    // cross join against a bounded side (16-row codebook shape): fine
    val tiny = (1 to 16).map(i => (i, i * 0.5)).toDF("cell", "w")
    guard()(l.crossJoin(tiny).queryExecution.analyzed)
    // conf kill-switch
    spark.conf.set("spark.graft.guard.cartesian", "false")
    try guard()(l.join(r, l("l_id") > r("r_id")).queryExecution.analyzed)
    finally spark.conf.set("spark.graft.guard.cartesian", "true")
  }

  test("pre-pushdown shapes: comma-join WHERE key and filtered product") {
    val l = big("l"); val r = big("r")
    // SQL comma-join: analyzes as Filter(equality) over Join(no cond) —
    // the key hasn't been pushed into the join yet at check time
    l.createOrReplaceTempView("guard_l")
    r.createOrReplaceTempView("guard_r")
    val comma = spark.sql(
      "SELECT * FROM guard_l, guard_r WHERE l_id = r_id")
    guard()(comma.queryExecution.analyzed)
    // same shape from the DataFrame API
    val filtered = l.crossJoin(r).filter(l("l_id") === r("r_id"))
    guard()(filtered.queryExecution.analyzed)
    // a Filter that is NOT a cross-side key does not rescue the join
    val stillBad = spark.sql(
      "SELECT * FROM guard_l JOIN guard_r WHERE l_id > 10")
    intercept[SparkException] { guard()(stillBad.queryExecution.analyzed) }
  }

  test("explicit Cross joinType is the user's call — exempt") {
    val l = big("l"); val r = big("r")
    guard()(l.crossJoin(r).queryExecution.analyzed)
    // but an INNER join that lost its key is still refused
    intercept[SparkException] {
      guard()(l.join(r, l("l_id") === l("l_id")).queryExecution.analyzed)
    }
  }
}
