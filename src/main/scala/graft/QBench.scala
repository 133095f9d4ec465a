package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query N times in a single session to separate
  * plan cost from host noise, with per-run scheduler accounting (job
  * count, task count, summed task time) so orchestration-bound queries
  * — many tiny jobs — are distinguishable from compute-bound ones.
  * Usage: runMain graft.QBench <sfDir> <name> [n]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", GraftSession.localDir)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("QB_AQE", "true"))
      .config("spark.shuffle.checksum.enabled",
        sys.env.getOrElse("QB_CHECKSUM", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("QB_CGCACHE", GraftSession.CodegenCacheEntries))
      .config("spark.file.transferTo",
        sys.env.getOrElse("QB_TRANSFERTO", GraftSession.FileTransferTo))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("QB_BYPASS", "200"))
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("QB_PLANSTR", "2147483632"))
      .config("spark.sql.ui.retainedExecutions",
        sys.env.getOrElse("QB_RETEXEC", "1000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val byStage =
      new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val byStageN =
      new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val stageNames =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val execDesc =
      new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val jobsByDesc =
      new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val runMs = new AtomicLong
    val deserMs = new AtomicLong
    val gcMs = new AtomicLong
    val resSerMs = new AtomicLong
    val cpuMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId, s.description)
          case _ => ()
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id.toLong)))
        val dkey = desc.getOrElse("<no-sql> " +
          j.stageInfos.map(_.name.takeWhile(_ != '(')).distinct
            .mkString("|").take(80))
        jobsByDesc.computeIfAbsent(dkey,
          _ => new AtomicInteger).incrementAndGet()
        j.stageInfos.foreach { si =>
          val nm = desc match {
            case Some(cs) if si.name.contains("CompletableFuture") ||
                si.name.contains("withThreadLocalCaptured") => cs
            case _ => si.name
          }
          stageNames.put(si.stageId, nm)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          runMs.addAndGet(t.taskMetrics.executorRunTime)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          resSerMs.addAndGet(t.taskMetrics.resultSerializationTime)
          cpuMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
        }
        if (t.taskInfo != null) {
          taskMs.addAndGet(t.taskInfo.duration)
          val name = stageNames.getOrDefault(t.stageId, "?")
          byStage.computeIfAbsent(name, _ => new AtomicLong)
            .addAndGet(t.taskInfo.duration)
          byStageN.computeIfAbsent(name, _ => new AtomicInteger)
            .incrementAndGet()
        }
      }
    })
    val q = SparkEntry.defs.find(_.name.contains(name)).get
    (1 to n).foreach { i =>
      jobs.set(0); tasks.set(0); taskMs.set(0); byStage.clear(); byStageN.clear()
      runMs.set(0); deserMs.set(0); gcMs.set(0); resSerMs.set(0); cpuMs.set(0)
      jobsByDesc.clear()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      println(f"[qbench] ${q.name} run $i: $wall%.2fs " +
        f"jobs=${jobs.get} tasks=${tasks.get} " +
        f"task_time=${taskMs.get / 1e3}%.1fs " +
        f"run=${runMs.get / 1e3}%.1fs cpu=${cpuMs.get / 1e3}%.1fs " +
        f"deser=${deserMs.get / 1e3}%.1fs gc=${gcMs.get / 1e3}%.1fs " +
        f"resser=${resSerMs.get / 1e3}%.1fs")
      import scala.jdk.CollectionConverters._
      byStage.asScala.toSeq.sortBy(-_._2.get).take(15).foreach {
        case (name, ms) =>
          val nt = byStageN.getOrDefault(name, new AtomicInteger).get
          println(f"[qbench]   ${ms.get / 1e3}%8.1fs ($nt%5d tasks)  $name")
      }
      if (sys.env.contains("QB_JOBS"))
        jobsByDesc.asScala.toSeq.sortBy(-_._2.get).take(20).foreach {
          case (d, c) => println(f"[qjobs] ${c.get}%4d  $d")
        }
    }
    spark.stop()
  }
}
