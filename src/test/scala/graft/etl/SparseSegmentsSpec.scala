package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deploy contract for the log-structured sparse-index layout: the
  * segmented live view must equal a from-scratch rebuild of the
  * surviving corpus on every table (x99 gates the serve cross-engine;
  * this pins the tables and the DISK layout), segment writes must
  * leave the base generation's files untouched (the O(delta)
  * maintenance-write claim as a file-level assertion), tombstone
  * scoping must make delete-then-revise correct, and compaction must
  * be serve-equivalent to the segmented view it folds.
  */
class SparseSegmentsSpec extends SparkSpec {

  private val cap = 5 // low: every term's list overflows at sf0.001

  private def tf: DataFrame =
    SparseIndex.termFreqs(Tables.documents(spark, sf)).cache()

  private def tableKey(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def assertSameIndex(a: SparseIndex.Index,
      b: SparseIndex.Index): Unit = {
    assert(tableKey(a.plist) == tableKey(b.plist), "plist drifted")
    assert(tableKey(a.df) == tableKey(b.df), "df drifted")
    assert(tableKey(a.dl) == tableKey(b.dl), "dl drifted")
    assert(tableKey(a.stats) == tableKey(b.stats), "stats drifted")
    assert(tableKey(a.tf) == tableKey(b.tf), "tf drifted")
  }

  test("append-seg + delete-seg view == rebuild of the surviving corpus") {
    val t = tf
    val base = SparseIndex.build(t.filter(col("doc_id") % 3 =!= 0), cap)
    val seg1 = SparseSegments.appendSegOf(base,
      t.filter(col("doc_id") % 3 === 0))
    val live1 = SparseSegments.view(base, Seq(seg1), cap)
    val del = t.select("doc_id").distinct()
      .filter(col("doc_id") % 10 === 3)
    assert(del.count() > 0)
    val seg2 = SparseSegments.deleteSegOf(live1, del)
    val live2 = SparseSegments.view(base, Seq(seg1, seg2), cap)
    val rebuilt = SparseIndex.build(
      t.filter(col("doc_id") % 10 =!= 3), cap)
    assertSameIndex(live2, rebuilt)
  }

  test("delete-then-revise across segments == revised rebuild (tombstone scoping)") {
    val t = tf
    val base = SparseIndex.build(t, cap)
    val revisedIds = t.filter(col("doc_id") % 7 === 2)
      .select("doc_id").distinct()
    assert(revisedIds.count() > 0)
    val revisedTf = t.join(revisedIds, Seq("doc_id"), "left_semi")
      .withColumn("tf", col("tf") + 1L)
    val seg1 = SparseSegments.deleteSegOf(base, revisedIds)
    val live1 = SparseSegments.view(base, Seq(seg1), cap)
    val seg2 = SparseSegments.appendSegOf(live1, revisedTf)
    val live2 = SparseSegments.view(base, Seq(seg1, seg2), cap)
    val rebuilt = SparseIndex.build(
      t.join(revisedIds, Seq("doc_id"), "left_anti")
        .unionByName(revisedTf), cap)
    assertSameIndex(live2, rebuilt)
  }

  test("ghost delete segment is a no-op view") {
    val t = tf
    val base = SparseIndex.build(t, cap)
    val ghosts = spark.range(900000, 900005)
      .select(col("id").as("doc_id"))
    val seg = SparseSegments.deleteSegOf(base, ghosts)
    // a ghost delete touches no terms — the view keeps every stored
    // list verbatim and only the (empty) delta unions differ
    val live = SparseSegments.view(base, Seq(seg), cap)
    assertSameIndex(live, base)
  }

  test("view plan cost grows LINEARLY per segment — the priced LSM trade") {
    val t = tf
    val base = SparseIndex.build(t.filter(col("doc_id") % 4 === 0), cap)
    val shards = (1 to 3).map(i => t.filter(col("doc_id") % 4 === i))
    var live = base
    var segs = Vector.empty[SparseSegments.Seg]
    val costs = scala.collection.mutable.ArrayBuffer[Int]()
    for (sh <- shards) {
      segs = segs :+ SparseSegments.appendSegOf(live, sh)
      live = SparseSegments.view(base, segs, cap)
      costs += graft.ShuffleCount.shuffles(
        live.plist.queryExecution.executedPlan.toString)
    }
    val d1 = costs(1) - costs(0)
    val d2 = costs(2) - costs(1)
    assert(d1 == d2, s"view growth is not linear in segments: $costs")
    assert(d1 <= 8, s"per-segment plan cost too high: $costs")
    // and the cost is REAL — a fresh (compacted) build plans flatter,
    // which is exactly why compact() exists
    val flat = graft.ShuffleCount.shuffles(
      SparseIndex.build(t, cap).plist
        .queryExecution.executedPlan.toString)
    assert(costs.last > flat, s"stack $costs vs flat $flat")
  }

  test("disk layout: O(delta) segment writes, read == view, compact == segmented") {
    val t = tf
    val root = java.nio.file.Files
      .createTempDirectory("sparse_segs").toString
    SparseSegments.init(
      SparseIndex.build(t.filter(col("doc_id") % 3 =!= 0), cap), root,
      cap)

    // snapshot the base generation's files
    def baseFiles(): Map[String, Long] = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$root/base"),
        true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> f.getModificationTime
      }
      b.result()
    }
    val before = baseFiles()
    assert(before.nonEmpty)

    SparseSegments.appendSeg(spark, root,
      t.filter(col("doc_id") % 3 === 0))
    SparseSegments.deleteSeg(spark, root,
      t.select("doc_id").distinct().filter(col("doc_id") % 10 === 3))
    assert(baseFiles() == before,
      "segment maintenance rewrote base files — the O(delta) claim")
    assert(SparseSegments.listSegs(spark, root) == Seq(0, 1))
    // an in-flight (unpublished) segment is invisible to readers
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/segs/_tmp_seg=2"))
    assert(SparseSegments.listSegs(spark, root) == Seq(0, 1))
    // the persisted cap is asserted against an explicit mismatch
    intercept[IllegalArgumentException] {
      SparseSegments.read(spark, root, Some(cap + 1))
    }

    val live = SparseSegments.read(spark, root, Some(cap))
    val rebuilt = SparseIndex.build(
      t.filter(col("doc_id") % 10 =!= 3), cap)
    assertSameIndex(live, rebuilt)

    val outRoot = java.nio.file.Files
      .createTempDirectory("sparse_segs_c").toString
    SparseSegments.compact(spark, root, outRoot)
    val compacted = SparseSegments.read(spark, outRoot, Some(cap))
    assert(SparseSegments.listSegs(spark, outRoot).isEmpty)
    assertSameIndex(compacted, rebuilt)
  }
}
