package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries execute into the `noop` sink so the FULL physical plan runs
  * (a bare `count()` would let Catalyst prune projections and skip the
  * actual operator work).
  *
  * Timeout-hardened (r1 postmortem — BENCH_r01 was rc=124/parsed:null
  * because the single JSON line printed only after all 43 queries): a
  * cumulative parseable line is emitted after EVERY query, so the last
  * stdout line always carries whatever completed before a kill.
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var done = List.empty[(String, Double)]
    def emit(): Unit = {
      val ordered = done.reverse
      val qs = ordered.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = ordered.map(_._2).filter(_ >= 0).sum
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
      System.out.flush()
    }
    emit() // parseable even if killed before the first query finishes
    // JIT warmup: interpreted expression paths (higher-order functions,
    // object aggregates) are megamorphic and take C2 a long time to
    // compile — first executions run 5-10x slower than steady state.
    // Warm each query once at the smallest scale factor just before
    // timing it, so a timeout part-way still measured everything it ran.
    // (Measured: same query 194s cold → 16s warm.)
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val dt = try {
        fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name $t%.2fs")
        t
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
      done = (name -> dt) :: done
      emit()
    }
    spark.stop()
  }
}
