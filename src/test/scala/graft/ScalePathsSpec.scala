package graft

import org.apache.spark.sql.functions._

/** Proofs for two 100 TB techniques the exact-oracle queries can't carry
  * (approximation isn't hash-matchable; partition layout is physical):
  * approximate distinct counting as Q2's scale path, and partition
  * pruning on a date-partitioned layout. */
class ScalePathsSpec extends SparkSpec {

  test("approx_count_distinct tracks exact within 5% (Q2 scale path)") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    // rsd 0.01 → ~1% expected error; 3% leaves ~3 sigma of headroom
    assert(math.abs(approx - exact).toDouble / exact < 0.03,
      s"exact=$exact approx=$approx")
  }

  test("q26_approx_distinct tracks per-group exact within its rsd bound") {
    val o = Tables.orders(spark, sf)
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"))
    val approx = SparkEntry.queries("q26_approx_distinct")(spark, sf)
    val joined = approx.join(exact, "o_orderpriority").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_buyers")
      val e = r.getAs[Long]("exact")
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"${r.getAs[String]("o_orderpriority")}: exact=$e approx=$a")
    }
  }

  test("date-partitioned writes prune partitions under a date filter") {
    val dir = java.nio.file.Files.createTempDirectory("part_prune")
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day")
      .parquet(s"$dir/events_by_day")
    val all = spark.read.parquet(s"$dir/events_by_day")
    val days = all.select("day").distinct().count()
    assert(days > 1, "need multiple partitions to prove pruning")
    val oneDay = all.select("day").distinct().orderBy("day").head()
      .getDate(0)
    val pruned = all.filter(col("day") === lit(oneDay))
    // the partition filter must reach the scan: only 1 of N partition
    // directories is read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(pruned.count() ==
      all.filter(col("day") === lit(oneDay)).count())
    // physical proof: selected partition count is 1 of `days`
    val selected = "partition count: (\\d+)".r
      .findFirstMatchIn(scanned.toLowerCase)
    selected.foreach(m => assert(m.group(1).toInt == 1, scanned.take(300)))
  }

  test("approx_percentile stays within its rank-error bound of exact " +
      "(q15 scale path)") {
    val li = Tables.lineitem(spark, sf)
    val acc = 1000 // rank error ≤ 1/acc of the group size
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.9)").as("exact"),
      expr(s"approx_percentile(l_extendedprice, 0.9, $acc)").as("approx"),
      count(lit(1)).as("n")).head()
    val (exact, approx, n) = (row.getDouble(0), row.getDouble(1),
      row.getLong(2))
    // convert the rank guarantee into a value check: the approx result
    // must be a real value whose rank is within n/acc of the 0.9 rank
    val tol = math.max(1L, n / acc)
    val below = li.filter(col("l_extendedprice") <= approx).count()
    val targetRank = (0.9 * n).toLong
    assert(math.abs(below - targetRank) <= 2 * tol,
      s"exact=$exact approx=$approx rank=$below target=$targetRank")
  }
}
