package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The co-location proof behind j18: joining two tables bucketed on
  * the same key × same bucket count plans with NO shuffle exchange on
  * either side, and produces exactly the plain join's rows. */
class BucketingSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_buckspec/$name"

  test("bucketed join is shuffle-free and value-identical") {
    val li = Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "buckspec_li", tmp("li"), "l_orderkey", 4)
    val ord = Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "buckspec_ord", tmp("ord"), "o_orderkey", 4)

    val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    assert(Bucketing.isShuffleFree(joined),
      "bucketed join must plan without shuffle exchanges:\n" +
        joined.queryExecution.executedPlan)

    // groupBy on a superset of the bucket key stays shuffle-free too
    val agg = joined.groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(count(lit(1)).as("n"))
    assert(Bucketing.isShuffleFree(agg),
      "bucket-keyed aggregate must reuse the layout:\n" +
        agg.queryExecution.executedPlan)

    // physical layout must not change a single value
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == plain)

    Bucketing.drop(spark, "buckspec_li")
    Bucketing.drop(spark, "buckspec_ord")
  }

  test("an unbucketed twin of the same join DOES shuffle") {
    // the control: without the layout, the same join pays exchanges —
    // guards against isShuffleFree going vacuously true
    val joined = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf).hint("merge")
        .select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.isShuffleFree(joined))
  }
}
