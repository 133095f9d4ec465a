package graft.streaming

import org.apache.spark.sql.SparkSession

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
  * [[once]] records AFTER the body, so the failure direction is
  * always LOUD, never a silent duplicate: a crash inside the body
  * leaves no marker, the retry re-runs the body, and if the crashed
  * attempt had already published its segment the families' overlap
  * asserts (appendSeg's disjointness require) refuse the re-append
  * instead of double-counting — the operator resolves the orphan
  * (vacuum collects unreferenced debris) rather than discovering a
  * corrupt index later. SegmentIngestSpec pins: a chunked stream with
  * a kill/restart between micro-batches ingests every shard exactly
  * once (stream-built layout ≡ signing the whole corpus from
  * scratch), and a replayed batchId is a recorded no-op.
  *
  * Single writer per layout, as everywhere in the segment layer
  * ([[graft.etl.SegmentOps.publishSeg]]'s contract — one streaming
  * query IS one writer).
  */
object SegmentIngest {

  private def markerDir(s: SparkSession, root: String) = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/ingested")
    (dir, dir.getFileSystem(s.sparkContext.hadoopConfiguration))
  }

  /** True iff `batchId` is recorded as applied under `root`. */
  def ingested(s: SparkSession, root: String, batchId: Long): Boolean = {
    val (dir, fs) = markerDir(s, root)
    fs.exists(new org.apache.hadoop.fs.Path(dir, s"batch=$batchId"))
  }

  /** Run `body` exactly once per (root, batchId): a recorded batch is
    * skipped (returns false); otherwise the body runs and the batch
    * is recorded (returns true). Call from foreachBatch with the
    * sink's own batchId. */
  def once(s: SparkSession, root: String, batchId: Long)
      (body: => Unit): Boolean = {
    if (ingested(s, root, batchId)) return false
    body
    val (dir, fs) = markerDir(s, root)
    fs.mkdirs(dir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, s"batch=$batchId"), true)
    out.close()
    true
  }
}
