package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental batch ingestion with an on-lake processed-files
  * manifest — the batch twin of Structured Streaming's file-source
  * checkpoint: each run processes only files it has never seen, and
  * marks them processed only after the run's output is safely down.
  *
  * The manifest is itself a parquet table of `path` strings, so the
  * new-file discovery is a distributed LEFT ANTI join (listing ⟕̸
  * manifest) — at lake scale a manifest of millions of entries never
  * materializes on the driver; only the NEW paths do (bounded by one
  * batch's arrivals, the same row set the job must enumerate anyway).
  * Commits append — re-committing a path is harmless because reads
  * always go through the anti-join (idempotent, at-least-once commit +
  * dedup-on-read = exactly-once processing).
  *
  * Crash contract: process-then-commit. A crash between output and
  * commit re-processes that batch's files on the next run — safe when
  * the downstream write is idempotent (overwrite-by-partition, dedup
  * key, or [[Sources.writeOrdered]]'s overwrite mode), which is the
  * standard lake ingestion discipline.
  */
object IngestManifest {

  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files currently present under `dir` (ignores hidden/_ files
    * and subdirectories), as a single-column `path` DataFrame. */
  def listing(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val files = hfs(spark, p).listStatus(p).toSeq
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filterNot { f =>
        val n = f.substring(f.lastIndexOf('/') + 1)
        n.startsWith("_") || n.startsWith(".")
      }
    import spark.implicits._
    files.toDF("path")
  }

  /** Unseen paths as a DataFrame — the distributed anti-join, nothing
    * on the driver yet. */
  private def unseen(spark: SparkSession, dir: String,
      manifestDir: String): DataFrame = {
    val listed = listing(spark, dir)
    val m = new org.apache.hadoop.fs.Path(manifestDir)
    if (!hfs(spark, m).exists(m)) listed
    else listed.join(spark.read.parquet(manifestDir), Seq("path"),
      "left_anti")
  }

  /** Hard cap on paths [[newFiles]]/[[readNew]] will materialize on
    * the driver. Path strings are ~100 B, so the default bounds the
    * driver at ~10 MB; a lake whose single-run arrivals exceed it
    * should be on [[processNew]] anyway. */
  val DriverPathCap = 100000

  /** Paths under `dir` not yet recorded in the manifest. The anti-join
    * runs distributed; only the new-batch paths come back, and never
    * more than `maxFiles` of them: the collect goes through a
    * limit(maxFiles+1) — bounded BEFORE driver materialization — and
    * overflow fails fast instead of silently processing a truncated
    * batch. For lakes where one run's arrivals can exceed the cap use
    * [[processNew]], which never holds more than `batchSize` paths. */
  def newFiles(spark: SparkSession, dir: String, manifestDir: String,
      maxFiles: Int = DriverPathCap): Seq[String] = {
    require(maxFiles > 0, s"maxFiles must be positive: $maxFiles")
    val got = unseen(spark, dir, manifestDir).limit(maxFiles + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(got.size <= maxFiles,
      s"more than $maxFiles unseen files under $dir — use " +
        s"processNew(batchSize) for unbounded backlogs")
    got
  }

  /** Record `files` as processed (append-only; duplicates are deduped
    * by the read-side anti-join). Call AFTER the batch's output is
    * durable. */
  def commit(spark: SparkSession, manifestDir: String,
      files: Seq[String]): Unit =
    if (files.nonEmpty) {
      import spark.implicits._
      files.toDF("path").write.mode("append").parquet(manifestDir)
    }

  /** One incremental batch: a DataFrame over exactly the unprocessed
    * files (None when nothing is new) plus the commit thunk to run
    * once the batch's output is durable. Inherits [[newFiles]]'s
    * driver cap — backlogs past `maxFiles` belong on [[processNew]]. */
  def readNew(spark: SparkSession, dir: String, manifestDir: String,
      maxFiles: Int = DriverPathCap)
      : Option[(DataFrame, () => Unit)] = {
    val fresh = newFiles(spark, dir, manifestDir, maxFiles)
    if (fresh.isEmpty) None
    else Some((spark.read.parquet(fresh: _*),
      () => commit(spark, manifestDir, fresh)))
  }

  /** Streamed incremental processing in BOUNDED batches: repeatedly
    * take the lexicographically-first `batchSize` unseen paths (the
    * anti-join + limit run distributed — at most one batch of path
    * strings ever reaches the driver), run `process` on that batch's
    * DataFrame, and commit the batch only after `process` returns.
    * Returns the number of files processed this run.
    *
    * Failure contract = readNew's, but per batch: a crash mid-run
    * loses only the in-flight batch's commit. Committed batches stay
    * committed; the next run's anti-join re-discovers exactly the
    * uncommitted remainder — exactly-once end to end given an
    * idempotent downstream write (IngestManifestSpec simulates the
    * mid-run crash and proves no file is processed twice). */
  def processNew(spark: SparkSession, dir: String, manifestDir: String,
      batchSize: Int)(process: DataFrame => Unit): Int = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    var total = 0
    var done = false
    while (!done) {
      // Re-plan the anti-join each round: the manifest grew by the
      // previous commit, so the next limit() slice is the next batch.
      val batch = unseen(spark, dir, manifestDir)
        .orderBy("path").limit(batchSize)
        .collect().map(_.getString(0)).toSeq
      if (batch.isEmpty) done = true
      else {
        process(spark.read.parquet(batch: _*))
        commit(spark, manifestDir, batch)
        total += batch.size
        if (batch.size < batchSize) done = true
      }
    }
    total
  }
}
