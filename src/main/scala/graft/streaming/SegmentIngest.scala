package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.etl.SegmentOps

/** ONLINE ingest into the log-structured index layouts — the
  * streaming counterpart of the w09/w10/w11 nightly jobs. A
  * foreachBatch sink that calls [[graft.etl.SparseSegments]]/
  * [[graft.etl.PqSegments]]/[[graft.etl.MinHashSegments]].appendSeg
  * per micro-batch turns index maintenance continuous, but Structured
  * Streaming's foreachBatch contract is AT-LEAST-ONCE: after a crash
  * the last uncommitted batch is re-delivered, and a naive sink would
  * append the same shard twice. The standard fix (the Delta/Iceberg
  * txn-id pattern) is batchId-keyed idempotence: record each applied
  * batchId under the layout root and skip re-deliveries.
  *
  * [[once]] records AFTER the body, so a crash INSIDE the body leaves
  * no marker and the retry re-runs it cleanly. The crash windows
  * AFTER the body's segment publication are SELF-HEALING (VERDICT
  * r11 #2): the body publishes its segment tagged with the batchId
  * (the tag file rides inside the bundle rename, so it is exactly as
  * atomic as the segment itself), and a retry that finds no marker
  * but a tagged published segment knows the work landed — it
  * completes whatever the crash cut short and skips the body. Two
  * sub-windows, both healed: a crash INSIDE publishSeg (after the
  * bundle rename, before its manifest record) leaves a tagged dir no
  * manifest names — the retry completes the RECORD (guarded by
  * [[graft.etl.SegmentOps.recordedInAnyManifest]]: a segment any
  * retained version names was recorded and possibly FOLDED since,
  * and re-recording it would silently double-count — the naive
  * probe's trap); a crash after publishSeg leaves only the marker
  * missing — the retry records it. Zero manual intervention either
  * way. Contract for the guarantee: ONE segment publication per
  * (layout, batch) — the foreachBatch shape, one shard → one
  * appendSeg. A body that publishes several segments per batch falls
  * back to the loud path (the families' disjointness requires refuse
  * a half-replayed batch; vacuum collects the orphan).
  *
  * RETENTION PRECONDITION (ADVICE r12): the tag probe needs the
  * tagged dir to SURVIVE until the retry runs. If a compaction folds
  * an un-markered batch's segment AND `vacuum(keepLast = 1)` releases
  * it before the retry, taggedSegs comes back empty and the body
  * re-runs: an append still fails LOUD (the folded base already holds
  * the docs, tripping the disjointness require), but a DELETE batch
  * would re-apply silently — harmless for the delete itself
  * (re-tombstoning), yet it narrows exactly-once to effectively-once.
  * Operationally: while an ingest may hold an un-markered batch, run
  * vacuum with keepLast large enough to span a batch's
  * publish-to-marker window (any keepLast ≥ 2 spans it, since the
  * window closes on the very next once() call for that batch).
  *
  * Marker writes are CREATE-EXCLUSIVE, so of two attempts racing the
  * record (Spark's documented zombie-driver foreachBatch overlap)
  * exactly one creates it — and since both attempts carry the same
  * tag, the laggard's body is skipped by the tag probe, not re-run.
  * The residual double-run window (two drivers BOTH past the tag
  * probe before either publishes) is closed for appends by the
  * disjointness requires; DELETE batches in that window re-apply
  * silently, which is harmless for the delete itself (tombstoning a
  * tombstoned doc) but means the exactly-once guarantee is
  * effectively-once for deletes — the loud-failure guarantee covers
  * append batches.
  *
  * Markers are BOUNDED (ADVICE r11): foreachBatch only ever
  * re-delivers batches at or after the last uncommitted one, so
  * [[once]] prunes markers older than `batchId - RetainMarkers`
  * as it records — a long-lived ingest keeps O(RetainMarkers)
  * marker files, not one per micro-batch forever. One layout pairs
  * with ONE checkpoint lineage: a fresh checkpoint restarts batchIds
  * at 0, which an existing layout's markers/tags would wrongly skip.
  *
  * SegmentIngestSpec pins: a chunked stream with a kill/restart
  * between micro-batches ingests every shard exactly once
  * (stream-built layout ≡ signing the whole corpus from scratch), a
  * replayed batchId is a recorded no-op, and a crash INSIDE the gap
  * (segment published, marker missing) heals on retry into the
  * identical index.
  */
object SegmentIngest {

  /** Markers kept behind the newest batch — generous vs foreachBatch's
    * single re-deliverable batch. */
  val RetainMarkers = 64L

  /** The tag recorded on segments published by `batchId` (via the
    * families' appendSeg/deleteSeg `tag` parameter). */
  def batchTag(batchId: Long): String = s"batch=$batchId"

  private def markerDir(s: SparkSession, root: String) = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/ingested")
    (dir, dir.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  /** True iff `batchId` is recorded as applied under `root`. */
  def ingested(s: SparkSession, root: String, batchId: Long): Boolean = {
    val (dir, fs) = markerDir(s, root)
    fs.exists(new org.apache.hadoop.fs.Path(dir, s"batch=$batchId"))
  }

  /** Record `batchId` as applied (create-exclusive; a concurrent
    * attempt's record is accepted as done) and prune markers older
    * than the retention window. */
  private def record(s: SparkSession, root: String, batchId: Long)
      : Unit = {
    val (dir, fs) = markerDir(s, root)
    fs.mkdirs(dir)
    // atomic even on the local FS (SegmentOps.createExclusive — a
    // concurrent attempt's record is accepted as done)
    SegmentOps.createExclusive(fs,
      new org.apache.hadoop.fs.Path(dir, s"batch=$batchId"))
    pruneMarkers(s, root, batchId - RetainMarkers)
  }

  /** Delete markers with batchId < `olderThan`; returns how many.
    * Stray entries under the marker dir fail loud by name (the
    * manifest-debris policy). */
  def pruneMarkers(s: SparkSession, root: String, olderThan: Long)
      : Int = {
    val (dir, fs) = markerDir(s, root)
    if (!fs.exists(dir)) return 0
    val old = fs.listStatus(dir).toSeq.map(_.getPath)
      .filterNot(_.getName.startsWith("."))
      .filter { p =>
        val n = p.getName
        val body = n.stripPrefix("batch=")
        if (!n.startsWith("batch=") || body.isEmpty ||
            !body.forall(_.isDigit))
          throw new IllegalStateException(
            s"SegmentIngest: unrecognized marker entry '$n' in $dir " +
              "— expected batch=<long>; remove or rename the stray " +
              "entry")
        body.toLong < olderThan
      }
    old.foreach(fs.delete(_, false))
    old.size
  }

  /** Run `body` exactly once per (root, batchId): a recorded batch is
    * skipped; a crash-gap retry (segment tagged+published, marker
    * missing) completes the marker WITHOUT re-running the body;
    * otherwise the body runs with the batch's tag — pass it through
    * to the family's appendSeg/deleteSeg `tag` parameter so the gap
    * is detectable — and the batch is recorded. Returns true iff the
    * body ran now. Call from foreachBatch with the sink's own
    * batchId. */
  def once(s: SparkSession, root: String, batchId: Long)
      (body: String => Unit): Boolean = {
    if (ingested(s, root, batchId)) return false
    val tag = batchTag(batchId)
    val tagged = SegmentOps.taggedSegs(s, root, tag)
    if (tagged.nonEmpty) {
      // crash in the gap: the previous attempt PUBLISHED its segment
      // but died before the marker — and possibly before publishSeg's
      // own manifest record (the rename→record window). Complete
      // whatever is missing, in order: the manifest record for any
      // tagged segment NO retained manifest version names (a version
      // naming it means it was recorded — and maybe folded since, so
      // re-recording would double-count), then the marker. The body
      // is never re-run (self-healing retry, VERDICT r11 #2).
      tagged
        .filterNot(SegmentOps.recordedInAnyManifest(s, root, _))
        .foreach(SegmentOps.recordSegInManifest(s, root, _))
      record(s, root, batchId)
      return false
    }
    body(tag)
    record(s, root, batchId)
    true
  }
}
