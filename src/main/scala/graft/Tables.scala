package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a driver testdata directory
  * (`/root/testdata/sf*` — see TESTDATA.md).
  *
  * Scale-first notes: each accessor is a plain lazy parquet scan so
  * Catalyst can push filters/prune columns into the scan
  * (`PushedFilters`/`ReadSchema`). Nothing here caches or collects; at
  * 100 TB these read partitioned parquet the same way.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan across the cluster. The testdata parquet files are a
    * single row group, so Spark reads each as ONE partition and any
    * per-row-heavy downstream work (lambda-based text/vector kernels)
    * runs on one core. One round-robin shuffle fixes that. On real
    * multi-row-group / multi-file data this is a no-op cost-wise, and at
    * 100 TB the scan already arrives partitioned — call this only ahead
    * of compute-bound stages, never before plain scan→agg. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * Read nanos as long (legacy conf) and truncate to a microsecond
    * timestamp — same truncation DuckDB applies converting ns→µs.
    * The conf write is idempotent (always "true") so concurrent plan
    * construction is safe; the driver mains also set it at session
    * build so shared sessions never flip it mid-flight. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
