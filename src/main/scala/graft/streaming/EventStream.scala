package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The transform is defined once ([[windowedCounts]]) and applied to both
  * a batch DataFrame and a `readStream` source — the streaming/batch
  * parity test in EventStreamSpec asserts both produce identical rows.
  *
  * Scale: tumbling event-time windows + watermark bound the state store;
  * the aggregation is keyed by (window, event_type) so state grows with
  * the number of active windows × event types, not with input rows.
  */
object EventStream {

  /** Shared batch/stream transform: 1-hour tumbling windows per
    * event_type. Uses `window()` (streaming-compatible), not date_trunc. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Shared batch/stream transform, SLIDING form (2 h window, 1 h
    * slide — the st04 query): each event lands in window/slide = 2
    * overlapping windows, assigned executor-side by `window()` (a row
    * expansion, never a self-join). State is bounded by active windows
    * × event types exactly as the tumbling form — overlap multiplies
    * the active-window count by window/slide, not by input rows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "3 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Normalize a raw events frame to the µs-timestamp contract
    * (delegates to the shared encoding-adaptive rule). */
  def normalize(raw: DataFrame): DataFrame = graft.Tables.normalizeTs(raw)

  /** Per-user gap sessions via Spark's NATIVE `session_window`
    * aggregation — the built-in alternative to the custom
    * flatMapGroupsWithState in [[Sessionize]] (use the built-in when
    * the per-session result is a plain aggregate; drop to custom state
    * only for arbitrary per-session logic). Same 1800 s gap as
    * Sessionize, so the two produce identical session boundaries —
    * asserted by spec. Works identically over batch and stream frames;
    * with a watermark, closed sessions evict from state. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"),
        s"${Sessionize.gapSeconds} seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double")
          .as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("n_events"), col("total_value"))

  /** Open the events table as a file stream and start the windowed
    * aggregation into an in-memory sink named `queryName`.
    *
    * Default output mode is `append`: finalized windows emit once the
    * watermark passes, and the state store purges them — state stays
    * bounded by active windows. `complete` (used by the parity spec to
    * read the full result without advancing the watermark) retains ALL
    * windows in state forever — test-only, not a production mode. */
  def start(spark: SparkSession, dir: String, queryName: String,
      outputMode: String = "append",
      transform: DataFrame => DataFrame = windowedCounts)
      : StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // File streams need a declared schema; probe the footer with a batch
    // read (driver-side, metadata only) so the declared type matches
    // whatever encoding THIS Spark build gives the nanos column.
    val fileSchema = spark.read.parquet(dir).schema
    val stream = spark.readStream
      .schema(fileSchema)
      .parquet(s"$dir")
    transform(normalize(stream))
      .writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
