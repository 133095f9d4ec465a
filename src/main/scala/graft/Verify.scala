package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-hardened (r1 postmortem — CORRECTNESS_r01 was empty because the
  * driver's run crawled on the local[4] default and got killed):
  *   - cpus default to the machine's processors, not 4;
  *   - oracle_sql.json is written FIRST, so a partial run still yields
  *     per-query comparisons for whatever parquet dirs landed;
  *   - queries run on a small thread pool — Spark schedules concurrent
  *     jobs fine and the many small sf0.01 jobs don't saturate 32 cores
  *     individually, so overlapping them cuts wall time ~3x.
  */
object Verify {

  /** Static expected-cost tier (r2 postmortem: queries ran alphabetically,
    * so a partial kill left an arbitrary subset of parquet dirs). Cheap
    * single-table / generator queries go first; heavyweight dedup / ANN /
    * full-ETL queries last — a wall-clock kill then costs the FEWEST
    * green correctness rows. Tiers from BENCH_r02 + judge-run timings.
    */
  def costTier(name: String): Int = name match {
    // tier 0: static dims, generators, tiny scalar transforms
    case n if n.startsWith("t1") || n.startsWith("t0") => 0
    case n if n.startsWith("m0") || n.startsWith("x13") => 0
    // tier 1: single-table scans / row-expression queries
    case n if n.startsWith("x0") && !n.startsWith("x02") &&
      !n.startsWith("x04") && !n.startsWith("x05") => 1
    case n if n.startsWith("a0") || n.startsWith("st0") => 1
    // row-local ops (PII redact, repetition, packing, quantize): cheap
    case n if n.startsWith("x15") || n.startsWith("x16") ||
      n.startsWith("x17") || n.startsWith("x19") => 1
    case n if n.startsWith("q0") && !n.startsWith("q07") &&
      !n.startsWith("q09") => 1
    case n if n.startsWith("q1") || n.startsWith("j0") => 2
    case n if n.startsWith("q07") || n.startsWith("q09") => 2
    // tier 3: pair-generating dedup / ANN / decontamination /
    // shingle- or fingerprint-heavy corpus passes
    case n if n.startsWith("x02") || n.startsWith("x04") ||
      n.startsWith("x05") || n.startsWith("x10") ||
      n.startsWith("x14") || n.startsWith("x18") ||
      n.startsWith("x37") || n.startsWith("x39") ||
      n.startsWith("x40") || n.startsWith("x41") ||
      n.startsWith("x44") || n.startsWith("x46") => 3
    // double index build + touched-term re-truncation / IVFPQ compose
    case n if n.startsWith("x92") || n.startsWith("x95") ||
      n.startsWith("x96") || n.startsWith("x97") ||
      n.startsWith("x98") => 3
    // tier 4: iterative + full-pipeline (w1x = the disk-lifecycle
    // flagships — eager segment writes before the timed plan)
    case n if n.startsWith("x11") || n.startsWith("w0") ||
      n.startsWith("w1") || n.startsWith("x89") ||
      n.startsWith("x90") || n.startsWith("x93") => 4
    case _ => 2
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        GraftSession.CodegenCacheEntries)
      .config("spark.file.transferTo", GraftSession.FileTransferTo)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Environment snapshot (the BENCH_r05 diagnostics, r5 verdict item:
    // a partially-killed correctness run should be self-explaining).
    // Written up front and refreshed after every query completion, so
    // whatever survives a kill says how far the run got and whether the
    // machine was gc-bound/overloaded when it died.
    val tStart = System.nanoTime()
    val done = new java.util.concurrent.atomic.AtomicInteger
    val failed = new java.util.concurrent.atomic.AtomicInteger
    def writeEnv(): Unit = {
      import java.lang.management.ManagementFactory
      val gc = ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum / 1e3
      val cpu = ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
      val load = ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      def r3(v: Double) = math.round(v * 1000) / 1000.0
      val env = s"""{"cpus":$cpus,"n_queries":${SparkEntry.queries.size},""" +
        s""""n_done":${done.get},"n_failed":${failed.get},""" +
        s""""gc_sec":${r3(gc)},"cpu_sec":${r3(cpu)},""" +
        s""""load_avg":${r3(load)},""" +
        s""""wall_sec":${r3((System.nanoTime() - tStart) / 1e9)}}"""
      Files.writeString(Paths.get(s"$outDir/_env.json"), env)
    }
    writeEnv()
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (costTier(name), name) }
      .filter(q => only.forall(q._1.contains)).map { case (name, fn) =>
        Future {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            done.incrementAndGet()
            System.err.println(
              f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
          } catch { case e: Throwable =>
            failed.incrementAndGet()
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          Verify.synchronized(writeEnv())
        }
      }
    Await.result(Future.sequence(futures), Duration.Inf)
    pool.shutdown()
    spark.stop()
  }
}
