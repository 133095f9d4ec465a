package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{MinHashSegments, NearDup, SegmentOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online-ingest contract for the segment layer: a foreachBatch sink
  * streaming document shards into MinHashSegments.appendSeg — WITH a
  * kill and checkpoint-restart between micro-batches — must build
  * exactly the index a from-scratch signing of the whole corpus
  * builds (every shard applied once, no drops, no dupes), and a
  * re-delivered batchId must be a recorded no-op. This is the online
  * counterpart of the w09/w10/w11 nightly lifecycles: maintenance
  * WRITES go continuous, not just the serving reads
  * (SegmentedServeSpec's half).
  */
class SegmentIngestSpec extends SparkSpec {

  private def sigKey(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("streamed appendSeg ingest across a restart == from-scratch signing; replays are no-ops") {
    val docs = Tables.documents(spark, sf).cache()
    val root = java.nio.file.Files
      .createTempDirectory("graft_seg_ingest").toString
    // night 0: the standing base
    MinHashSegments.init(
      NearDup.signatures(docs.filter(col("doc_id") % 3 =!= 0)), root)

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_q")
    val in = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val shard = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text")
    def start() = spark.readStream.schema(shard.schema).parquet(in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        SegmentIngest.once(spark, root, id) { tag =>
          MinHashSegments.appendSeg(spark, root, df, tag = Some(tag))
        }
        ()
      }
      .start()

    val run1 = start()
    try {
      shard.filter(col("doc_id") % 6 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      run1.processAllAvailable()
    } finally run1.stop() // the kill between micro-batches
    val run2 = start()    // checkpoint restart
    try {
      shard.filter(col("doc_id") % 6 === 3).coalesce(1)
        .write.mode("append").parquet(in)
      run2.processAllAvailable()
    } finally run2.stop()

    // exactly-once: the stream-built layout equals signing the whole
    // corpus from scratch — a dropped chunk loses rows, a duplicated
    // one would have tripped appendSeg's disjointness require
    assert(sigKey(MinHashSegments.read(spark, root))
      == sigKey(NearDup.signatures(docs)),
      "stream-ingested layout drifted from the from-scratch signing")
    assert(SegmentOps.listSegs(spark, root).size == 2)

    // a re-delivered batchId is a recorded no-op: the body must NOT
    // run again (running it would throw the overlap require)
    val batchIds = (0L to 10L).filter(SegmentIngest.ingested(spark,
      root, _))
    assert(batchIds.nonEmpty, "no ingest markers recorded")
    val replayed = SegmentIngest.once(spark, root, batchIds.head) {
      _ => fail("replayed batch body must not run")
    }
    assert(!replayed)
    // and a NEW batchId still runs
    var ran = false
    assert(SegmentIngest.once(spark, root, 999L) { _ => ran = true })
    assert(ran)
  }

  test("crash in the gap (segment published, marker missing) self-heals on retry") {
    val docs = Tables.documents(spark, sf).cache()
    val root = java.nio.file.Files
      .createTempDirectory("graft_seg_ingest_gap").toString
    MinHashSegments.init(
      NearDup.signatures(docs.filter(col("doc_id") % 3 =!= 0)), root)
    val shard = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text")

    // simulate the crash: the batch's appendSeg PUBLISHED (tagged)
    // but the attempt died before SegmentIngest recorded the marker
    val batchId = 7L
    MinHashSegments.appendSeg(spark, root, shard,
      tag = Some(SegmentIngest.batchTag(batchId)))
    assert(!SegmentIngest.ingested(spark, root, batchId))

    // the retry must detect the tagged segment, complete the marker,
    // and NOT re-run the body (re-running would trip appendSeg's
    // disjointness require = the r11 loud-refusal it replaces)
    val ran = SegmentIngest.once(spark, root, batchId) { _ =>
      fail("crash-gap retry must not re-run the body")
    }
    assert(!ran)
    assert(SegmentIngest.ingested(spark, root, batchId),
      "self-heal must complete the marker")
    // and the healed layout serves exactly the from-scratch signing
    assert(sigKey(MinHashSegments.read(spark, root))
      == sigKey(NearDup.signatures(docs)))
    // a later replay of the same batch is the ordinary recorded no-op
    assert(!SegmentIngest.once(spark, root, batchId)(_ =>
      fail("healed batch must stay a no-op")))
  }

  test("crash INSIDE publishSeg's gap (bundle renamed, manifest record missing) heals by completing the record") {
    val docs = Tables.documents(spark, sf).cache()
    val root = java.nio.file.Files
      .createTempDirectory("graft_seg_ingest_pubgap").toString
    MinHashSegments.init(
      NearDup.signatures(docs.filter(col("doc_id") % 3 =!= 0)), root)
    val shard = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text")
    val batchId = 5L
    MinHashSegments.appendSeg(spark, root, shard,
      tag = Some(SegmentIngest.batchTag(batchId)))
    // simulate the crash between publishSeg's rename and its manifest
    // record: roll the record back by deleting the latest version
    // (v2) — the tagged dir exists, no retained manifest names it
    val v2 = new org.apache.hadoop.fs.Path(s"$root/manifest/v=2")
    val fs = v2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(v2, false))
    assert(SegmentOps.resolveSnapshot(spark, root).segs.isEmpty,
      "rollback must hide the segment from the manifest")

    val ran = SegmentIngest.once(spark, root, batchId) { _ =>
      fail("publish-gap retry must not re-run the body")
    }
    assert(!ran)
    assert(SegmentIngest.ingested(spark, root, batchId))
    // the heal completed the RECORD: the snapshot names the segment
    // and the served view equals the from-scratch signing — a heal
    // that only wrote the marker would silently LOSE the shard
    assert(SegmentOps.resolveSnapshot(spark, root).segs.map(_._1)
      == Seq(0))
    assert(sigKey(MinHashSegments.read(spark, root))
      == sigKey(NearDup.signatures(docs)))
  }

  test("a tagged segment a compaction already folded is NOT re-recorded by the healer") {
    val docs = Tables.documents(spark, sf).cache()
    val root = java.nio.file.Files
      .createTempDirectory("graft_seg_ingest_folded").toString
    MinHashSegments.init(
      NearDup.signatures(docs.filter(col("doc_id") % 3 =!= 0)), root)
    val batchId = 9L
    MinHashSegments.appendSeg(spark, root,
      docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text"),
      tag = Some(SegmentIngest.batchTag(batchId)))
    MinHashSegments.compactInPlace(spark, root) // folds the segment
    // the marker is lost, the tagged dir survives (not vacuumed), and
    // manifest HISTORY still names it — the healer must not re-record
    // (re-adding a folded segment would double-count its rows)
    val snapBefore = SegmentOps.resolveSnapshot(spark, root)
    assert(snapBefore.segs.isEmpty)
    assert(!SegmentIngest.once(spark, root, batchId)(_ =>
      fail("folded-segment retry must not re-run the body")))
    val snapAfter = SegmentOps.resolveSnapshot(spark, root)
    assert(snapAfter.segs.isEmpty,
      "healer re-recorded a folded segment — double count")
    assert(SegmentIngest.ingested(spark, root, batchId))
    assert(sigKey(MinHashSegments.read(spark, root))
      == sigKey(NearDup.signatures(docs)))
  }

  test("marker retention: old markers prune; stray marker entries fail loud") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_seg_ingest_prune").toString
    // no segment layer needed: bodies that publish nothing still
    // record markers (taggedSegs on a layout with no segs dir = empty)
    (0L to 4L).foreach(id =>
      SegmentIngest.once(spark, root, id)(_ => ()))
    assert((0L to 4L).forall(SegmentIngest.ingested(spark, root, _)))
    assert(SegmentIngest.pruneMarkers(spark, root, 3L) == 3)
    assert(!SegmentIngest.ingested(spark, root, 2L))
    assert(SegmentIngest.ingested(spark, root, 3L))
    // auto-prune inside once(): a far-future batch drops everything
    // older than its retention window
    val far = 3L + SegmentIngest.RetainMarkers + 10L
    SegmentIngest.once(spark, root, far)(_ => ())
    assert(!SegmentIngest.ingested(spark, root, 3L),
      "once() must auto-prune markers behind the retention window")
    assert(SegmentIngest.ingested(spark, root, far))
    // debris fails loud by name
    val stray = new org.apache.hadoop.fs.Path(s"$root/ingested/batch=x")
    stray.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(stray, true).close()
    val e = intercept[IllegalStateException](
      SegmentIngest.pruneMarkers(spark, root, 0L))
    assert(e.getMessage.contains("batch=x"))
  }
}
