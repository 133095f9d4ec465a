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
}
