package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print per-query shuffle-exchange counts as a Scala Map
  * literal — the generator for PlanAuditSpec's shuffle baseline.
  * Usage: runMain graft.ShuffleCount [sfDir]
  */
object ShuffleCount {

  /** Shuffle exchanges in a physical plan string (broadcasts excluded —
    * they're the cheap kind the audit encourages). */
  def shuffles(plan: String): Int =
    "(?<!Broadcast)Exchange ".r.findAllIn(plan).length

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional 2nd arg: comma-separated name filter (audit one query
    // without replanning all 185)
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    SparkEntry.defs.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
      val n = shuffles(q.run(spark, sfDir).queryExecution.executedPlan
        .toString)
      println(s"""    "${q.name}" -> $n,""")
    }
    spark.stop()
  }
}
