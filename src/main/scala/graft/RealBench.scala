package graft

import org.apache.spark.sql.SparkSession

/** Steady-state timing of the real-data ETL (the number BASELINE.md's
  * 9.22 s pandas run is compared against).
  *
  * The headline "real-data E2E" figure has always bundled three very
  * different costs: JVM + SparkSession startup (fixed, amortized to
  * zero on a long-lived cluster), first-run JIT/codegen warmup, and
  * the actual per-row extract→transform→validate→write work. This main
  * separates them the honest way: ONE session, the full pipeline run
  * twice back-to-back (cold then warm), phase times from Pipeline.run's
  * own `[etl-phase]` instrumentation. The warm figure is the pipeline's
  * real marginal cost — what a second dataset through the same session
  * pays — and the cold−warm delta is the fixed tax.
  *
  * Usage: runMain graft.RealBench [dataDir] [outBase]
  * Prints one JSON line: {"cold_sec":…,"warm_sec":…,"session_sec":…}.
  */
object RealBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/reference/data")
    val outBase = args.lift(1).getOrElse("/tmp/graft_realbench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-realbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries",
        GraftSession.CodegenCacheEntries)
      .config("spark.file.transferTo", GraftSession.FileTransferTo)
      .config("spark.ui.enabled", "false")
      // the warehouse write is many small hive-partitioned files on a
      // syscall-expensive microVM: direct task commits (v2) + no
      // _SUCCESS markers halve the rename/create traffic. Fine HERE
      // because a failed bench run is discarded wholesale; the
      // engine's own segment publications don't rely on the committer
      // (publishSeg's tmp+rename is atomicity at the bundle level)
      .config(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "2")
      .config(
        "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
        "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tSession = (System.nanoTime() - t0) / 1e9

    def timed[T](f: => T): (T, Double) = {
      val t = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t) / 1e9)
    }
    def once(out: Option[String]): Double = {
      val (res, s) = timed(etl.Pipeline.run(spark,
        etl.Pipeline.fileInputs(spark, base), out))
      require(res.report.score > 0, "pipeline produced no quality score")
      s
    }
    val cold = once(Some(s"$outBase/cold"))
    val warm = once(Some(s"$outBase/warm"))
    // warm decomposition: extraction (driver-side xlsx parse + csv
    // schema binds) vs transform+validate without file sinks
    val (inputs, tExtract) = timed(etl.Pipeline.fileInputs(spark, base))
    val (_, tBuild) = timed(etl.Pipeline.run(spark, inputs, None))
    println(f"""{"metric":"realdata_etl","cold_sec":$cold%.2f,""" +
      f""""warm_sec":$warm%.2f,"warm_extract_sec":$tExtract%.2f,""" +
      f""""warm_build_validate_sec":$tBuild%.2f,""" +
      f""""session_sec":$tSession%.2f}""")
    spark.stop()
  }
}
