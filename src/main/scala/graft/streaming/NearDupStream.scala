package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.NearDup
import graft.etl.NearDup.LshConfig

/** Streaming NEAR-duplicate detection — the streaming twin of the batch
  * MinHash family (x02/x56/w05), completing the batch ≡ stream story the
  * dedup family started with exact-key st05: documents arrive as a
  * stream, and each one is checked against the RECENT corpus for banded
  * MinHash near-duplicates, with state bounded by a watermark horizon.
  *
  * Shape: signatures are computed row-locally by the native
  * [[graft.functions.MinHashSigs]] kernel (a projection — zero stream
  * shuffle), then each doc fans out to its `bands` LSH bucket keys and
  * the ONLY stateful shuffle is the groupByKey on the bucket — the
  * banded-candidate exchange, exactly the first exchange the batch
  * funnel pays. Per bucket, state is the member list (doc_id, ts, k
  * signature slots) within the watermark horizon; a new doc is verified
  * (signature agreement ≥ cfg.minSig) against ONLY its bucket's members
  * — never all-pairs, the same s-curve cost model as batch LSH.
  *
  * State contract: a member is dropped once the watermark passes its
  * event time, so per-bucket state is O(docs within the horizon), the
  * property that lets a 1000-executor monitor run forever. The trade is
  * the standard streaming one (st05's): near-dups separated by more
  * than the horizon both survive — the batch twin (st10) prices exactly
  * that trade by reporting caught vs escaped pairs per doc.
  *
  * Ordering contract: matches are emitted oriented by EVENT time (the
  * later (ts, doc_id) is the duplicate, the earlier the original), so
  * a late-arriving original still yields the correctly-oriented pair.
  * Feeding must be ts-nondecreasing across micro-batches for exact
  * batch parity (the st05/Changepoint discipline — an upstream
  * append-mode source provides it); within a batch any order works.
  * A pair sharing several buckets is emitted once per shared bucket —
  * consumers take the distinct (doc_id, dup_of) set, as
  * NearDup.candidates does with its final distinct.
  */
object NearDupStream {

  /** One doc in one LSH bucket: `bucket` = "band:bandKey". */
  final case class BandRow(bucket: String, doc_id: Long, ts: Timestamp,
      sig: Seq[Long])
  final case class Member(doc_id: Long, tsMs: Long, sig: Seq[Long])
  final case class BucketState(members: List[Member])
  /** A detected near-dup: `doc_id` is the later arrival, `dup_of` the
    * earlier, `gap_s` their event-time distance. */
  final case class Match(doc_id: Long, dup_of: Long, gap_s: Long,
      bucket: String)

  /** Banded signature rows from a (doc_id, ts, text) frame: the native
    * MinHash kernel + `bands` bucket keys per doc. A projection +
    * generator — no shuffle, streaming-safe. */
  def bandRows(docs: DataFrame, cfg: LshConfig = NearDup.DefaultConfig)
      : DataFrame = {
    val sig = array((0 until cfg.k).map(j => col("_mh").getItem(j)): _*)
    val buckets = array((0 until cfg.bands).map { b =>
      concat_ws(":", lit(b.toString),
        concat_ws("_", (0 until cfg.rows).map(r =>
          col("_mh").getItem(cfg.rows * b + r).cast("string")): _*))
    }: _*)
    docs.filter(size(split(col("text"), " ")) >= 3)
      .withColumn("_mh", graft.functions.MinHashSigs(col("text")))
      .select(explode(buckets).as("bucket"), col("doc_id"), col("ts"),
        sig.as("sig"))
  }

  private def agreement(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0; var n = 0
    while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }

  /** Fold one bucket's new rows into its member state, emitting every
    * verified in-horizon match. Pure — unit-testable without a
    * streaming query.
    *
    * State lifecycle: members the watermark has passed are filtered on
    * every invocation, and the WHOLE bucket state is REMOVED via event-
    * time timeout once the watermark passes its newest member + horizon
    * — load-bearing, because a bucket key is a content hash: most
    * buckets are never revisited, so without the timeout their rows
    * would sit in the state store forever (the numRowsTotal leak
    * NearDupStreamSpec's eviction test guards). */
  def step(horizonSec: Long, minSig: Int)(bucket: String,
      rows: Iterator[BandRow], state: GroupState[BucketState])
      : Iterator[Match] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // watermark eviction FIRST: members the watermark has passed can
    // never pair in-horizon with anything still admissible
    val hasWm =
      try { state.getCurrentWatermarkMs(); true }
      catch { case _: UnsupportedOperationException => false }
    val wmMs = if (hasWm) state.getCurrentWatermarkMs() else Long.MinValue
    var members = state.getOption.map(_.members).getOrElse(Nil)
      .filter(_.tsMs >= wmMs)
    val out = List.newBuilder[Match]
    // event-time order within the batch so in-batch pairs orient and
    // count exactly once (each row matches only already-inserted ones)
    rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      val rMs = r.ts.getTime
      members.foreach { m =>
        if (agreement(m.sig, r.sig) >= minSig) {
          val gapMs = math.abs(rMs - m.tsMs)
          if (gapMs <= horizonSec * 1000L) {
            // orient by event time: later (ts, id) is the duplicate
            val rLate = m.tsMs < rMs ||
              (m.tsMs == rMs && m.doc_id < r.doc_id)
            out += (if (rLate) Match(r.doc_id, m.doc_id, gapMs / 1000L,
              bucket)
            else Match(m.doc_id, r.doc_id, gapMs / 1000L, bucket))
          }
        }
      }
      members ::= Member(r.doc_id, rMs, r.sig)
    }
    state.update(BucketState(members))
    // streaming only (batch GroupState has no watermark to time out
    // against): remove this bucket once nothing can pair with it.
    // New rows are never older than the watermark (Spark drops late
    // rows pre-operator in append mode), so the timeout is always
    // strictly ahead of the current watermark as required.
    if (hasWm) state.setTimeoutTimestamp(
      members.iterator.map(_.tsMs).max + horizonSec * 1000L + 1L)
    out.result().iterator
  }

  /** Near-dup match stream over a (doc_id, ts, text) frame. On a
    * streaming frame the watermark delay IS the horizon, so dedup
    * state evicts exactly when a member leaves the matchable window;
    * on a batch frame the same fold runs once per bucket (state
    * empty), giving the identical match set — NearDupStreamSpec pins
    * the parity. */
  def matches(docs: DataFrame, horizonSec: Long = 600L,
      cfg: LshConfig = NearDup.DefaultConfig): Dataset[Match] = {
    import docs.sparkSession.implicits._
    val br = bandRows(docs, cfg)
    val wm = if (docs.isStreaming)
      br.withWatermark("ts", s"$horizonSec seconds") else br
    val timeout = if (docs.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    wm.as[BandRow].groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        timeout)(step(horizonSec, cfg.minSig))
  }
}
