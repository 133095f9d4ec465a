package graft.etl

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.SparkSpec

/** Multi-writer safety by PREVENTION (VERDICT r11 #4): manifest
  * version files are create-exclusive, so a second writer's version
  * bump fails atomically BEFORE any state changes — no rename race to
  * detect after the fact. Pins: (a) the raw CAS (stale expected
  * version → None, nothing written); (b) two interleaved publishers —
  * one wins, the loser's retry lands as the next version, and the
  * composed manifest equals sequential application; (c) two genuinely
  * concurrent writer THREADS recording segments through the
  * recordSegInManifest retry loop compose every name exactly once
  * with contiguous versions; (d) a compaction flip that loses its CAS
  * to a concurrent append carries the appended segment over — never
  * silently drops it; (e) two concurrent COMPACTIONS of one layout
  * fail loud (folds cannot merge); (f) manifest debris fails loud by
  * name.
  */
class SegmentCasSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("CAS: a stale expected version loses cleanly; the winner's bytes survive") {
    val root = tmpRoot("graft_cas_raw")
    assert(SegmentOps.publishManifest(spark, root, "base",
      Seq.empty) == 1)
    // two publishers both read v1; A wins v2
    assert(SegmentOps.tryPublishManifest(spark, root, 1, "base",
      Seq("seg=0-a")).contains(2))
    // B's CAS on the same expected version MUST fail — and must not
    // clobber A's published content
    assert(SegmentOps.tryPublishManifest(spark, root, 1, "base",
      Seq("seg=0-d")).isEmpty)
    val snap = SegmentOps.resolveSnapshot(spark, root)
    assert(snap.version == 2)
    assert(snap.segs.map(_._2) == Seq("seg=0-a"))
    // B re-derives against the current snapshot and lands as v3 —
    // sequential application
    assert(SegmentOps.tryPublishManifest(spark, root, 2, "base",
      snap.segs.map(_._2) :+ "seg=1-d").contains(3))
    assert(SegmentOps.resolveSnapshot(spark, root).segs.map(_._2)
      == Seq("seg=0-a", "seg=1-d"))
  }

  test("two concurrent writer threads compose every recorded segment exactly once") {
    val root = tmpRoot("graft_cas_threads")
    SegmentOps.publishManifest(spark, root, "base", Seq.empty)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    val names = (0 until 20).map(i =>
      s"seg=$i-${if (i % 2 == 0) 'a' else 'd'}")
    try Await.result(Future.sequence(Seq(
      Future(names.take(10).foreach(
        SegmentOps.recordSegInManifest(spark, root, _))),
      Future(names.drop(10).foreach(
        SegmentOps.recordSegInManifest(spark, root, _))))),
      Duration.Inf)
    finally pool.shutdown()
    val snap = SegmentOps.resolveSnapshot(spark, root)
    // every name exactly once, versions contiguous (init + 20 records
    // = v21: each record publishes exactly one version)
    assert(snap.segs.map(_._2).sorted == names.sorted)
    assert(snap.segs.map(_._2).distinct.size == 20)
    assert(snap.version == 21,
      s"expected contiguous versions ending at 21, got ${snap.version}")
    // per-thread order is preserved within each writer's subsequence
    val posOf = snap.segs.map(_._2).zipWithIndex.toMap
    assert(names.take(10).map(posOf) == names.take(10).map(posOf).sorted)
    assert(names.drop(10).map(posOf) == names.drop(10).map(posOf).sorted)
  }

  test("a compaction flip that loses its CAS carries the concurrently-appended segment") {
    val root = tmpRoot("graft_cas_flip")
    SegmentOps.publishManifest(spark, root, "base", Seq("seg=0-a"))
    val folded = SegmentOps.resolveSnapshot(spark, root) // v1: [seg=0-a]
    // a concurrent append records seg=1-a between the fold and the flip
    SegmentOps.recordSegInManifest(spark, root, "seg=1-a") // v2
    // the flip CAS on v1 loses, re-resolves v2, and carries seg=1-a
    val v = SegmentOps.flipCompacted(spark, root, folded, "base-g2")
    assert(v == 3)
    val snap = SegmentOps.resolveSnapshot(spark, root)
    assert(snap.baseDir == "base-g2")
    assert(snap.segs.map(_._2) == Seq("seg=1-a"),
      "the concurrent append must survive the flip; the folded " +
        "segment must not")
  }

  test("two concurrent compactions of one layout fail loud") {
    val root = tmpRoot("graft_cas_twofold")
    SegmentOps.publishManifest(spark, root, "base", Seq("seg=0-a"))
    val snapA = SegmentOps.resolveSnapshot(spark, root)
    SegmentOps.flipCompacted(spark, root, snapA, "base-g2")
    // compactor B folded the SAME v1 snapshot; its flip must refuse
    // (the base it folded no longer exists as current)
    val e = intercept[IllegalArgumentException](
      SegmentOps.flipCompacted(spark, root, snapA, "base-gX"))
    assert(e.getMessage.contains("concurrent compaction"))
  }

  test("a reader composes segments in NUMBER order whatever order the CAS recorded them") {
    // ADVICE r12 (medium): concurrent recordSegInManifest writers can
    // land lines out of segment-number order, and scopedUnion scopes
    // tombstones by list POSITION — a delete recorded after a
    // later-numbered append must still scope only over what was
    // PUBLISHED before it (its number), or the append is wrongly
    // masked. readManifest's sort is the fix; this pins it.
    val root = tmpRoot("graft_cas_order")
    SegmentOps.publishManifest(spark, root, "base", Seq.empty)
    SegmentOps.recordSegInManifest(spark, root, "seg=1-a") // append 1st
    SegmentOps.recordSegInManifest(spark, root, "seg=0-d") // delete 2nd
    val snap = SegmentOps.resolveSnapshot(spark, root)
    assert(snap.segs.map(_._1) == Seq(0, 1),
      "snapshot must order segments by number (publication order), " +
        s"got ${snap.segs.map(_._2)}")
  }

  private def plantClaim(root: String, v: Int, ageMs: Long): Unit = {
    val claim = new org.apache.hadoop.fs.Path(s"$root/manifest/claim_$v")
    val fs = claim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(claim, true).close()
    fs.setTimes(claim, System.currentTimeMillis() - ageMs, -1)
  }

  test("a crashed claimant's stale claim is stolen after the TTL; a fresh claim still blocks") {
    val root = tmpRoot("graft_cas_steal")
    SegmentOps.publishManifest(spark, root, "base", Seq.empty)
    // fresh claim (a live writer): the CAS loses cleanly, steals nothing
    plantClaim(root, 2, ageMs = 0L)
    assert(SegmentOps.tryPublishManifest(spark, root, 1, "base",
      Seq("seg=0-a")).isEmpty)
    assert(SegmentOps.resolveSnapshot(spark, root).version == 1)
    // backdate it past the TTL: the next writer steals and publishes
    plantClaim(root, 2, ageMs = SegmentOps.claimTtlMs(spark) + 60000L)
    assert(SegmentOps.tryPublishManifest(spark, root, 1, "base",
      Seq("seg=0-a")).contains(2))
    assert(SegmentOps.resolveSnapshot(spark, root).segs.map(_._2)
      == Seq("seg=0-a"))
  }

  test("recordSegInManifest heals through an orphan claim instead of crash-looping") {
    // ADVICE r12 (low): pre-steal, a claim orphaned by a hard crash
    // blocked its version forever — every later record spun the CAS
    // loop and threw until an operator deleted the claim by hand
    val root = tmpRoot("graft_cas_orphan")
    SegmentOps.publishManifest(spark, root, "base", Seq.empty)
    plantClaim(root, 2, ageMs = SegmentOps.claimTtlMs(spark) + 60000L)
    SegmentOps.recordSegInManifest(spark, root, "seg=0-a")
    val snap = SegmentOps.resolveSnapshot(spark, root)
    assert(snap.version == 2 && snap.segs.map(_._2) == Seq("seg=0-a"))
  }

  test("manifest debris fails loud by name") {
    val root = tmpRoot("graft_cas_debris")
    SegmentOps.publishManifest(spark, root, "base", Seq.empty)
    val stray = new org.apache.hadoop.fs.Path(s"$root/manifest/v=1.bak")
    stray.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(stray, true).close()
    val e = intercept[IllegalStateException](
      SegmentOps.resolveSnapshot(spark, root))
    assert(e.getMessage.contains("v=1.bak"))
  }
}
