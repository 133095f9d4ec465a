package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch x01
  * operator: drop repeated document/event ids as they arrive, with a
  * watermark bounding the dedup state.
  *
  * At scale this is the standard ingestion guard for an event or
  * document stream: state is keyed by the dedup id and entries older
  * than the watermark are evicted, so memory is O(ids within the
  * watermark window), never O(stream). The batch equivalent
  * (`dropDuplicates` on the same key) is the parity oracle in
  * StreamDedupSpec.
  */
object StreamDedup {

  /** Shared batch/stream transform: first event per (user_id, event_id)
    * within the watermark horizon survives. Works on a batch frame
    * (plain dropDuplicates semantics) and on a readStream frame
    * (stateful dedup with watermark eviction). */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_id")
}
