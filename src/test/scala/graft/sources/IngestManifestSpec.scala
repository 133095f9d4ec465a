package graft.sources

import graft.SparkSpec

class IngestManifestSpec extends SparkSpec {

  private def writeBatch(dir: String, sub: String, ids: Seq[Long])
      : Unit = {
    import spark.implicits._
    ids.toDF("id").coalesce(1).write.parquet(s"$dir/$sub")
    // move the part file up into dir (simulate files arriving flat)
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(p).filter(f =>
      f.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(part,
      new org.apache.hadoop.fs.Path(s"$dir/$sub.parquet"))
    fs.delete(p, true)
  }

  test("only never-seen files are processed; commit is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("ingest")
      .toString
    val dir = s"$base/in"; val manifest = s"$base/manifest"
    new java.io.File(dir).mkdirs()
    writeBatch(dir, "a", Seq(1L, 2L))
    writeBatch(dir, "b", Seq(3L))

    // first run sees both files
    val first = IngestManifest.newFiles(spark, dir, manifest)
    assert(first.size == 2)
    val Some((df1, commit1)) =
      IngestManifest.readNew(spark, dir, manifest)
    assert(df1.count() == 3)
    commit1()

    // nothing new -> None
    assert(IngestManifest.readNew(spark, dir, manifest).isEmpty)

    // a late arrival: only IT comes back
    writeBatch(dir, "c", Seq(4L, 5L))
    val Some((df2, commit2)) =
      IngestManifest.readNew(spark, dir, manifest)
    assert(df2.count() == 2)
    assert(df2.selectExpr("min(id)").head().getLong(0) == 4L)

    // double-commit the same batch: dedup-on-read keeps it exactly-once
    commit2(); commit2()
    assert(IngestManifest.readNew(spark, dir, manifest).isEmpty)

    // hidden/_ files are never ingested
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "_SUCCESS"), "")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, ".staged"), "")
    assert(IngestManifest.readNew(spark, dir, manifest).isEmpty)
  }

  test("newFiles is driver-bounded: overflow fails fast, cap is exact") {
    val base = java.nio.file.Files.createTempDirectory("ingest-cap")
      .toString
    val dir = s"$base/in"; val manifest = s"$base/manifest"
    new java.io.File(dir).mkdirs()
    (0 until 5).foreach(i => writeBatch(dir, f"f$i%02d", Seq(i.toLong)))

    // backlog (5) above the cap (3): fail fast, steer to processNew —
    // never silently truncate and never collect the full backlog
    val ex = intercept[IllegalArgumentException] {
      IngestManifest.newFiles(spark, dir, manifest, maxFiles = 3)
    }
    assert(ex.getMessage.contains("processNew"))
    // backlog exactly at the cap: fine
    assert(IngestManifest.newFiles(spark, dir, manifest, maxFiles = 5)
      .size == 5)
  }

  test("processNew streams discovery in bounded batches") {
    val base = java.nio.file.Files.createTempDirectory("ingest-b")
      .toString
    val dir = s"$base/in"; val manifest = s"$base/manifest"
    new java.io.File(dir).mkdirs()
    (0 until 10).foreach(i => writeBatch(dir, f"f$i%02d", Seq(i.toLong)))

    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val n = IngestManifest.processNew(spark, dir, manifest, 3) { df =>
      batchSizes += df.count()
    }
    assert(n == 10)
    // 10 files at batchSize 3 -> 3+3+3+1, never more than one batch
    // of paths in flight
    assert(batchSizes.toSeq == Seq(3L, 3L, 3L, 1L))
    // everything committed: a second run discovers nothing
    assert(IngestManifest.processNew(spark, dir, manifest, 3)(_ => ())
      == 0)
  }

  test("mid-run crash loses only the in-flight batch; no reprocessing") {
    val base = java.nio.file.Files.createTempDirectory("ingest-c")
      .toString
    val dir = s"$base/in"; val manifest = s"$base/manifest"
    new java.io.File(dir).mkdirs()
    (0 until 7).foreach(i => writeBatch(dir, f"f$i%02d", Seq(i.toLong)))

    // first run: crash while processing the SECOND batch (after the
    // first batch committed)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val boom = intercept[RuntimeException] {
      IngestManifest.processNew(spark, dir, manifest, 3) { df =>
        calls += 1
        if (calls == 2) throw new RuntimeException("executor lost")
        seen ++= df.collect().map(_.getLong(0))
      }
    }
    assert(boom.getMessage == "executor lost")
    assert(seen.toSet == Set(0L, 1L, 2L), "batch 1 committed pre-crash")

    // recovery run: exactly the uncommitted remainder, nothing twice
    val n2 = IngestManifest.processNew(spark, dir, manifest, 3) { df =>
      seen ++= df.collect().map(_.getLong(0))
    }
    assert(n2 == 4, "batch 2 was never committed -> re-discovered")
    assert(seen.sorted.toSeq == (0L to 6L).toSeq,
      "every file processed exactly once across crash + recovery")
  }
}
