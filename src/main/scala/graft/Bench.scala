package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries execute into the `noop` sink so the FULL physical plan runs
  * (a bare `count()` would let Catalyst prune projections and skip the
  * actual operator work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT warmup: interpreted expression paths (higher-order functions,
    // object aggregates) are megamorphic and take C2 a long time to
    // compile — first executions run 5-10x slower than steady state.
    // Warm each query once at the smallest scale factor, then time at
    // the target scale. (Measured: same query 194s cold → 16s warm.)
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name $dt%.2fs")
        name -> dt
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
