package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-stream interval join: purchases attributed to a preceding
  * view by the same user within an attribution window.
  *
  * This is the join class Structured Streaming is built for and plain
  * windowed aggregation can't express: BOTH sides are unbounded, and a
  * match pairs rows across them under an event-time constraint. The
  * interval condition plus watermarks on both sides lets Spark bound
  * the join state: buffered views evict once the watermark passes
  * `view.ts + window`, buffered purchases once it passes their own ts —
  * state is O(events inside the watermark horizon), never O(stream).
  *
  * At 100 TB/day the plan is the one you'd want: both sides shuffle on
  * user_id only (keyed state store partitioning); the time bound is a
  * residual predicate evaluated inside each key's buffered state, and
  * the same `attributed` transform runs unchanged over batch frames
  * (SortMergeJoin on user_id with the range residual) — which is how
  * the spec and the `st03` oracle query pin its semantics.
  */
object StreamJoin {

  /** Attribution horizon: a purchase belongs to any view of the same
    * user in the preceding 30 minutes. */
  val windowMinutes = 30

  /** Shared batch/stream transform. Inputs are event frames with the
    * µs-timestamp `ts` contract (`Tables.normalizeTs`). */
  def attributed(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    views.join(buys,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <=
          col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  /** Watermarked streaming variant of [[attributed]] over two file
    * streams of the same directory (each side filters its event type —
    * exactly how a Kafka topic pair would look). */
  def start(spark: SparkSession, dir: String, queryName: String)
      : StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir).schema
    def side(): DataFrame =
      graft.Tables.normalizeTs(
        spark.readStream.schema(fileSchema).parquet(dir))
    // 1h watermark >> the 30m join horizon: state eviction is correct
    // with room for out-of-order arrival (one watermark per side, on
    // the renamed event-time column that side joins on)
    val views = side().filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val buys = side().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = views.join(buys,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <=
          col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_ts"), col("purchase_ts"),
        col("purchase_value"))
    joined.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
  }

  /** Left-outer form of [[attributed]]: every view emits its matching
    * purchases, or ONE null-matched row if no purchase lands inside
    * the window — the "abandoned view" / conversion-failure stream.
    * Batch twin of [[startOuter]]. */
  def attributedOuter(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    views.join(buys,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <=
            col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"), col("view_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  /** Streaming left-outer interval join. The semantics only work
    * BECAUSE of watermarks: a null-matched view row can be emitted
    * only once the watermark proves no matching purchase can still
    * arrive (view_ts + window < watermark), so unmatched results
    * trail the event time by the watermark delay — the correctness/
    * latency trade outer stream joins are. State stays horizon-
    * bounded exactly as in the inner form. */
  def startOuter(spark: SparkSession, dir: String, queryName: String)
      : StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir).schema
    def side(): DataFrame =
      graft.Tables.normalizeTs(
        spark.readStream.schema(fileSchema).parquet(dir))
    val views = side().filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val buys = side().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = views.join(buys,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <=
            col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "leftOuter")
      .select(col("user_id"), col("view_ts"), col("purchase_ts"),
        col("purchase_value"))
    joined.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
  }
}
