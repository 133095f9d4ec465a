package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment (VERDICT r4 #6): does pre-projecting the decimal
  * products below the aggregate beat inline products inside sum()?
  * Expectation: no — CollapseProject + whole-stage codegen evaluate
  * both in the same generated stage — but measure, don't guess.
  * Usage: runMain graft.ExpQ40 <sfDir> [runs]
  */
object ExpQ40 {
  private def inline(s: SparkSession, d: String): DataFrame =
    SparkEntry.queries("q40_pricing_summary")(s, d)

  private def preProjected(s: SparkSession, d: String): DataFrame = {
    val pre = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(12,2)").as("q"),
        col("l_extendedprice").cast("decimal(12,2)").as("p"),
        col("l_discount").cast("decimal(4,2)").as("disc"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") -
            col("l_discount").cast("decimal(4,2)"))).as("dp"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") -
            col("l_discount").cast("decimal(4,2)")) *
          (lit(1).cast("decimal(3,2)") +
            col("l_tax").cast("decimal(4,2)"))).as("ch"))
    pre.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("q")).cast("double").as("sum_qty"),
        sum(col("p")).cast("double").as("sum_base_price"),
        sum(col("dp")).cast("double").as("sum_disc_price"),
        sum(col("ch")).cast("double").as("sum_charge"),
        (sum(col("q")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_qty"),
        (sum(col("p")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_price"),
        (sum(col("disc")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[exp] $name ${t}%.3fs")
      t
    }
    // alternate so JIT/GC drift hits both variants equally
    val results = (1 to runs).flatMap { _ =>
      Seq("inline" -> time("inline", inline),
        "preproject" -> time("preproject", preProjected))
    }
    results.groupBy(_._1).foreach { case (k, vs) =>
      val ts = vs.map(_._2).sorted
      println(f"[exp] $k min=${ts.min}%.3f median=${ts(ts.size / 2)}%.3f")
    }
    // sanity: identical results
    val a = inline(spark, sfDir).collect().map(_.toString).mkString
    val b = preProjected(spark, sfDir).collect().map(_.toString).mkString
    println(s"[exp] results_identical=${a == b}")
    spark.stop()
  }
}
