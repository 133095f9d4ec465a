package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the streaming twin of the batch x01
  * operator: drop repeated document/event ids as they arrive, with a
  * watermark bounding the dedup state.
  *
  * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: a plain
  * `dropDuplicates("user_id","event_id")` after `withWatermark` never
  * evicts state (eviction requires the event-time column among the dedup
  * keys), so state would grow O(all distinct ids ever seen) on a
  * long-running stream. With the WithinWatermark variant, state for an id
  * is dropped once the watermark passes its event time, so memory is
  * O(ids within the watermark window) — the contract a 100 TB/day
  * ingestion guard actually needs. The trade: duplicates separated by
  * more than the watermark delay both survive (late dup = new row),
  * which is the standard at-least-once ingestion semantics.
  *
  * StreamDedupSpec asserts batch/stream parity and that streaming state
  * is actually evicted once the watermark passes.
  */
object StreamDedup {

  /** Shared batch/stream transform: first event per (user_id, event_id)
    * within the watermark horizon survives. The WithinWatermark variant
    * is streaming-only (Spark's UnsupportedOperationChecker rejects it on
    * batch frames), so the batch path uses plain dropDuplicates — same
    * result whenever duplicates land within the watermark horizon. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("user_id", "event_id")
    else events.dropDuplicates("user_id", "event_id")
}
