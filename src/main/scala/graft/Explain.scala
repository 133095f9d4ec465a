package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for one or more queries.
  * Usage: runMain graft.Explain <sfDir> <nameSubstring> */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val filter = args.lift(1).getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.defs.filter(_.name.contains(filter)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
