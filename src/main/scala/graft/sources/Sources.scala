package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest/egress surface (SURVEY.md §2.1).
  *
  * S1/S2 — CSV scans with explicit schemas (never inference at scale:
  * inference reads the data twice and guesses; a declared StructType
  * pushes straight into the vectorized reader) and the reference's
  * missing-file tolerance (main_etl_pipeline.py:58-84 logs and skips
  * absent inputs instead of failing the run).
  *
  * S5 — ordered warehouse load (main_etl_pipeline.py:752-794 loads
  * Dims → Bridges → Facts so FK targets exist first). With parquet the
  * ordering is just sequential writes; kept as an explicit API because
  * a JDBC sink would need the same contract.
  */
object Sources {

  /** S1/S2: read one CSV with declared schema; None if absent. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read
      .option("header", header.toString)
      .schema(schema)
      .csv(path))
  }

  /** S1 (fault-tolerant CSV form): capture malformed rows instead of
    * silently nulling them (PERMISSIVE default) or killing the job
    * (FAILFAST). The declared schema is extended with `corruptCol`; a
    * row that fails to parse lands there verbatim with the data
    * columns null, so ingest QA can count/inspect/quarantine bad rows
    * as a DataFrame instead of grepping logs. At 100 TB a handful of
    * mangled rows per shard is the NORMAL case — the pipeline must
    * quantify them, not die or hide them. None if the path is absent.
    *
    * Spark caveat (documented upstream): a query whose column pruning
    * reduces the scan to ONLY the corrupt column is rejected —
    * `.cache()` the parsed frame before corrupt-column-only
    * aggregates (the spec pins this usage). */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true,
      corruptCol: String = "_corrupt_record"): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol,
        org.apache.spark.sql.types.StringType))
      .csv(path))
  }

  /** S1 (JSONL form): newline-delimited JSON — the standard interchange
    * format for LLM training corpora. Same declared-schema stance as
    * [[csv]] (inference would scan the data twice and guess); a corrupt
    * line lands in `_corrupt_record` if the schema declares it,
    * otherwise nulls (PERMISSIVE default) — at 100 TB a malformed shard
    * must not kill the job. None if the path is absent. */
  def jsonl(spark: SparkSession, path: String, schema: StructType)
      : Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.schema(schema).json(path))
  }

  /** S1 (ORC form): columnar alternative to parquet — same pushdown/
    * pruning properties through Spark's vectorized ORC reader; pairs
    * with `writeOrdered(format = "orc")` for warehouses standardized on
    * ORC. Schema comes from the file footer (self-describing, no
    * inference scan). None if the path is absent. */
  def orc(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None else Some(spark.read.orc(path))
  }

  /** S1: read a set of named CSVs, skipping (and reporting) missing
    * files — returns (loaded tables, missing names). */
  def csvBatch(spark: SparkSession, files: Map[String, (String, StructType)])
      : (Map[String, DataFrame], Seq[String]) = {
    val loaded = files.flatMap { case (name, (path, schema)) =>
      csv(spark, path, schema).map(name -> _)
    }
    (loaded, files.keys.filterNot(loaded.contains).toSeq.sorted)
  }

  /** S5: file-sink load — one directory per table, Dims → Bridges →
    * Facts list order. Unlike the JDBC form, file targets have no FK
    * dependency, so the independent per-table write JOBS overlap on a
    * small pool (each is its own Spark job; tiny dim writes are pure
    * scheduling overhead that would otherwise serialize). `partitions`
    * opts a table into hive-style directory partitioning (e.g. facts
    * by date key): at scale that is what makes time-window queries
    * partition-pruned scans instead of full reads — the layout the
    * reference's date indexes approximate. */
  def writeOrdered(tables: Seq[(String, DataFrame)], baseDir: String,
      format: String = "parquet",
      partitions: Map[String, Seq[String]] = Map.empty): Unit = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(
      math.max(1, math.min(8, tables.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(tables.map { case (name, df) =>
      Future {
        val part = partitions.get(name).filter(_.nonEmpty)
        val w = sizedForWrite(df, part).write.mode("overwrite")
          .format(format)
        part.fold(w)(cols => w.partitionBy(cols: _*))
          .save(s"$baseDir/$name")
      }
    }), Duration.Inf)
    finally pool.shutdown()
  }

  /** Size-adaptive file layout for [[writeOrdered]] (optimization
    * guide §6: output files should track DATA size, not task count).
    * Without this every write inherits the upstream partitioning — a
    * sub-MB nightly segment fans out into one near-empty file per
    * core (each paying full parquet-writer setup, the dominant cost
    * of the whole segment-lifecycle family at bench scale), while at
    * 100 TB the same inheritance can under- or over-split. An AQE
    * REBALANCE hint lets the runtime coalesce/split to
    * `spark.sql.adaptive.advisoryPartitionSizeInBytes` — adaptive at
    * every scale, keyed by the hive-partition columns when the table
    * has them (so one task holds whole directory partitions instead
    * of tasks x partitions fragments). A plan whose top is already an
    * explicit repartition/rebalance keeps its layout — those call
    * sites (e.g. SparseSegments' bucket-clustered tf) encode a
    * DELIBERATE clustering this hint must not double-shuffle. */
  private def sizedForWrite(df: DataFrame,
      part: Option[Seq[String]]): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      LocalRelation, Repartition, RepartitionByExpression,
      RebalancePartitions}
    val explicitLayout = df.queryExecution.logical match {
      case _: Repartition | _: RepartitionByExpression |
          _: RebalancePartitions => true
      // a LocalRelation (vacuous segment tables, tiny static dims) is
      // driver-local and writes as one task already — a rebalance
      // would only add a shuffle stage job per write
      case _: LocalRelation => true
      case _ => false
    }
    if (explicitLayout) df
    else part.fold(df.hint("rebalance"))(cols =>
      df.hint("rebalance", cols.map(org.apache.spark.sql.functions.col)
        : _*))
  }

  /** S5 (JDBC form): dependency-ordered warehouse load through Spark's
    * JDBC sink (main_etl_pipeline.py:752-794 — `df.to_sql` per table,
    * Dims → Bridges → Facts so FK targets always exist first). Tested
    * against embedded Derby (ships with Spark); at scale the same call
    * fans out one INSERT batch per partition — `numPartitions`/
    * `batchsize` on `props` control sink parallelism. */
  def writeOrderedJdbc(tables: Seq[(String, DataFrame)], url: String,
      props: java.util.Properties = new java.util.Properties,
      mode: String = "overwrite"): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode(mode).jdbc(url, name, props)
    }

  /** Z-order clustered write — multi-dimensional data skipping. A
    * linearly-sorted table gives narrow parquet row-group min/max
    * stats on the LEADING sort column only; filters on the second
    * column still scan every file. Interleaving the bits of k numeric
    * columns into one Morton key and range-sorting on it keeps every
    * clustered dimension's per-file min/max range narrow
    * (≈ range/2^(log2(files)/k)), so the reader's row-group stats
    * pruning skips files for predicates on ANY clustered column — the
    * layout trick Delta/Iceberg OPTIMIZE ZORDER applies, here as a
    * plain parquet write.
    *
    * Scale: the min/max pre-pass is one O(1)-output agg job (catalog
    * stats would replace it on a governed table);
    * `repartitionByRange` samples the z-key exactly like any range
    * sort; everything else is row-local bit arithmetic in codegen.
    * NULLs in a clustered column land in cell 0 (sorted first, still
    * skippable). */
  def writeZOrdered(df: DataFrame, zcols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(zcols.size >= 2, "z-order needs >= 2 columns; use a plain " +
      "sort for 1")
    require(zcols.size * bits <= 62, "zcols*bits must fit a long")
    import org.apache.spark.sql.functions._
    val statCols = zcols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val maxCell = (1L << bits) - 1
    val cells = zcols.zipWithIndex.map { case (c, i) =>
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      val scale = if (hi > lo) maxCell / (hi - lo) else 0.0
      least(lit(maxCell), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) * lit(scale))
          .cast("long")))
    }
    val k = zcols.size
    val zkey = (0 until bits).flatMap { b =>
      cells.zipWithIndex.map { case (cell, i) =>
        shiftleft(shiftright(cell, b).bitwiseAND(lit(1L)), b * k + i)
      }
    }.reduce(_ bitwiseOR _)
    df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the table-maintenance op every long-lived
    * lake needs: streaming sinks, per-trigger micro-batches, and
    * over-parallel writes leave thousands of KB-sized files whose
    * open/footer overhead dominates scans long before row count does.
    * Rewrites a directory to ≈`targetBytes` files per partition using
    * the actual on-disk size (not a guessed file count), preserving
    * hive partition columns if present.
    *
    * Swap safety: writes to `<dir>.compact.tmp` then swaps via two
    * renames, each checked — a failed rename aborts and rolls the
    * original directory back, so the table is never lost. Note the
    * swap is crash-SAFE but not reader-atomic: between the two renames
    * the table path briefly does not exist (each rename is atomic on
    * HDFS-like filesystems, but the pair isn't). A concurrent reader
    * can observe a missing directory for that instant; coordinated
    * maintenance windows — or a manifest/metastore pointer swap on
    * object stores — are how production lakes close that gap.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val df = spark.read.parquet(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    if (partitionCols.nonEmpty) {
      // one file per hive directory: all rows of a partition value land
      // in one writer. (A partition value bigger than targetBytes would
      // need an additional salt split — date-grain partitions at this
      // table's write sizes sit well under it.)
      df.repartition(partitionCols.map(org.apache.spark.sql.functions
          .col): _*)
        .write.partitionBy(partitionCols: _*).parquet(tmp.toString)
    } else {
      val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      df.repartition(n).write.parquet(tmp.toString)
    }
    if (!fs.rename(path, old))
      throw new java.io.IOException(
        s"[graft] compact($dir): could not move current table aside " +
          s"($path -> $old); table left untouched, compacted copy at $tmp")
    if (!fs.rename(tmp, path)) {
      // Roll back: put the original table directory back before failing.
      val restored = fs.rename(old, path)
      throw new java.io.IOException(
        s"[graft] compact($dir): could not move compacted copy into " +
          s"place ($tmp -> $path); original " +
          (if (restored) s"restored at $path"
           else s"NOT restored — recover it manually from $old"))
    }
    // Only drop the previous copy once the new table is verifiably in
    // place — this delete is the point of no return.
    if (fs.exists(path)) fs.delete(old, true)
    fs.getContentSummary(path).getLength
  }

  /** Partition retention — TTL enforcement on a hive-partitioned table
    * (the other half of lake maintenance next to [[compact]]): drop
    * whole partition directories whose partition value sorts strictly
    * below `cutoff`. Deleting at the directory level is O(partitions)
    * metadata work with zero data rewrite — the reason date-partitioned
    * layouts are how retention is done at 100 TB (a row-level DELETE
    * would rewrite every file). String comparison matches hive's
    * lexicographic partition ordering, which for ISO dates and
    * zero-padded keys equals value ordering.
    *
    * Returns the dropped partition values. */
  def expirePartitions(spark: SparkSession, dir: String, partitionCol: String,
      cutoff: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Nil
    val prefix = s"$partitionCol="
    fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(s => (s.getPath, s.getPath.getName.stripPrefix(prefix)))
      .filter { case (_, v) => v < cutoff }
      .sortBy(_._2)
      .map { case (p, v) => fs.delete(p, true); v }
  }

  /** S6: single-document JSON report sink (driver-side, tiny). */
  def writeJsonReport(json: String, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json)
  }
}
