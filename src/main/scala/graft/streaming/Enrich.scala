package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-static enrichment: join a live event stream against a static
  * dimension — the standard "decorate the firehose" path (user events ←
  * customer attributes, docs ← source metadata).
  *
  * Stream-static joins need NO watermark and keep NO join state: each
  * micro-batch plans a fresh batch join against the static side, so a
  * broadcast-able dimension makes every micro-batch a map-side hash
  * join — zero shuffle of the stream. That is the 100 TB/day shape:
  * the stream never repartitions, the dim ships once per executor.
  * (A dimension too big to broadcast shuffles the micro-batch on the
  * key — still correct, still bounded per trigger.)
  */
object Enrich {

  /** Shared batch/stream transform: per-segment rollup of purchase
    * events enriched with the customer's market segment. `dim` is the
    * static side (broadcast when small — the hint is safe here: the
    * customer dim is bounded by the user population, not by event
    * volume, and the caller chooses the hint). */
  def bySegment(events: DataFrame, dim: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .join(broadcast(dim), col("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(28,6)")).cast("double")
          .as("total_value"))

  /** Streaming form over a parquet file stream; `complete` output —
    * the rollup is a running total per segment (bounded cardinality). */
  def start(spark: SparkSession, dir: String, dim: DataFrame,
      queryName: String): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(dir).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(fileSchema).parquet(dir))
    bySegment(stream, dim).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
  }
}
