package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SqlRunnerSkewSpec extends SparkSpec {
  import spark.implicits._

  test("S7 parse strips comments, splits statements, keeps SET") {
    val script =
      """-- leading comment
        |SET spark.sql.shuffle.partitions = 4;
        |/* block
        |   comment */
        |SELECT 1 AS a; -- trailing
        |SELECT @MIN_AGE AS min_age;
        |""".stripMargin
    val stmts = SqlRunner.parse(script)
    assert(stmts.length == 3)
    assert(stmts.head.startsWith("SET"))
    val results = SqlRunner.run(spark, script, Map("MIN_AGE" -> "13"))
    assert(results(0).result.isEmpty)           // SET → no result set
    assert(results(1).result.get.collect()(0).getInt(0) == 1)
    assert(results(2).result.get.collect()(0).getInt(0) == 13)
  }

  test("S7 runs a validation-style rule block over temp views") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    val script =
      """-- PK check (validation.sql:49 style)
        |SELECT COUNT(*) AS total, COUNT(DISTINCT o_orderkey) AS dk
        |FROM orders_v;
        |-- range rule with session var
        |SELECT SUM(CASE WHEN o_totalprice < @MIN_PRICE THEN 1 ELSE 0 END)
        |  AS violations FROM orders_v;""".stripMargin
    val rs = SqlRunner.run(spark, script, Map("MIN_PRICE" -> "0"))
    val pk = rs(0).result.get.collect()(0)
    assert(pk.getLong(0) == pk.getLong(1)) // orderkey unique
    assert(rs(1).result.get.collect()(0).getLong(0) == 0L)
  }

  test("salted aggregate equals plain aggregate") {
    val df = Tables.lineitem(spark, sf)
    val plain = df.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedAggregate(df, Seq($"l_returnflag"), 16,
      partial = Seq(sum($"l_quantity").as("s"), count(lit(1)).as("c")),
      merge = Seq(sum($"s").as("s"), sum($"c").as("c")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_quantity")
    val p = Tables.part(spark, sf)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = li.join(p, "l_partkey").count()
    val salted = Skew.saltedJoin(li, p, "l_partkey", 8).count()
    assert(salted == plain && plain > 0)
  }

  test("bucketed tables co-locate the join (no shuffle exchange)") {
    val wh = java.nio.file.Files.createTempDirectory("bucketed").toString
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").option("path", s"$wh/customer_b")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → no ShuffleExchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$plan")
    assert(joined.count() > 0)
  }
}
