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
    // (Measured: same query 194s cold → 16s warm.) Warm every query at
    // the smallest scale factor CONCURRENTLY — C2 compilation is shared
    // across threads and the tiny sf0.001 jobs overlap, so the warm
    // phase costs wall-minutes less than the old one-by-one pass — then
    // time serially (fair, uncontended) with a cumulative emit per query.
    val warmDir = {
      val w = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    locally {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(6)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val t0 = System.nanoTime()
      Await.result(Future.sequence(ordered.map { case (name, fn) =>
        Future {
          try fn(spark, warmDir).write.format("noop").mode("overwrite")
            .save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warm $name failed: ${e.getMessage}")
          }
        }
      }), Duration.Inf)
      pool.shutdown()
      System.err.println(
        f"[bench] warmup done (${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    ordered.foreach { case (name, fn) =>
      val dt = try {
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
