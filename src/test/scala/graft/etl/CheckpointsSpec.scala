package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Both lineage-cut modes of [[Checkpoints]] behind one operator:
  * default = localCheckpoint (executor-memory blocks), conf-gated =
  * reliable checkpoint() (fault-tolerant directory — the cluster
  * mode). Same results either way; the reliable mode must actually
  * write under the configured root. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("default mode localCheckpoints (no checkpoint files written)") {
    assert(spark.conf.getOption(Checkpoints.DirConf).isEmpty)
    val df = Checkpoints.cut((1L to 10L).toDF("v"))
    assert(df.agg(sum("v")).head().getLong(0) == 55L)
    assert(df.queryExecution.optimizedPlan.toString
      .contains("LogicalRDD"), "cut must have truncated lineage")
  }

  test("graft.checkpoint.dir switches to reliable checkpoints") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val (labels, _) = ConnectedComponents.runCounted(
        (0L until 63L).map(i => (i, i + 1)).toDF("a", "b"))
      assert(labels.as[(Long, Long)].collect().toMap
        .values.forall(_ == 0L))
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .count()
      assert(written > 0, "reliable mode must write checkpoint files")
      // Superseded rounds are RELEASED as the loop advances: of the
      // rounds+1 cuts the run made, only the final fixpoint's
      // checkpoint may remain on disk — a converged run must not
      // leave one directory per round behind.
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(rddDirs == 1,
        s"expected exactly the final round's checkpoint, found $rddDirs")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      // Leave no dangling checkpoint-dir state for later suites.
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  test("x11 dup-cluster funnel end-to-end in reliable mode: identical " +
      "results, checkpoints under the configured root") {
    val run = graft.SparkEntry.queries("x11_dup_clusters")
    val local = run(spark, sf).collect().map(_.toString).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-x11").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val rel = run(spark, sf).collect().map(_.toString).toSeq
      assert(rel == local,
        "reliable-checkpoint mode must be a pure deployment switch")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(files > 0, "the funnel's cuts must have gone durable")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  test("both modes produce identical results on the same input") {
    val edges = Seq((5L, 9L), (9L, 2L), (7L, 8L), (3L, 7L))
    val local = ConnectedComponents.run(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt2").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val rel = ConnectedComponents.run(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(rel == local)
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }
}
