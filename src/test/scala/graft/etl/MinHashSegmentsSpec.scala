package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deploy contract for the MinHash family's log-structured signature
  * index: the segmented live view must equal re-signing the surviving
  * corpus (signatures are row-local, so scoped union IS the whole
  * composition), segment writes must leave base files untouched,
  * tombstone scoping must make delete-then-revise correct, and
  * compaction must be view-equivalent.
  */
class MinHashSegmentsSpec extends SparkSpec {

  private def docs: DataFrame = Tables.documents(spark, sf).cache()

  private def sigKey(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("append-seg + delete-seg view == re-signing the surviving corpus") {
    val d = docs
    val base = NearDup.signatures(d.filter(col("doc_id") % 3 =!= 0))
    val seg1 = MinHashSegments.appendSegOf(base,
      d.filter(col("doc_id") % 3 === 0))
    val live1 = MinHashSegments.view(base, Seq(seg1))
    val del = d.select("doc_id").distinct()
      .filter(col("doc_id") % 10 === 3)
    val seg2 = MinHashSegments.deleteSegOf(live1, del)
    val live2 = MinHashSegments.view(base, Seq(seg1, seg2))
    val resigned = NearDup.signatures(d.filter(col("doc_id") % 10 =!= 3))
    assert(sigKey(live2) == sigKey(resigned))
    assert(sigKey(live2).nonEmpty)
  }

  test("delete-then-revise across segments == re-signing the revised corpus") {
    val d = docs
    val base = NearDup.signatures(d)
    val ids = d.filter(col("doc_id") % 7 === 2)
      .select("doc_id").distinct()
    assert(ids.count() > 0)
    val revisedDocs = d.join(ids, Seq("doc_id"), "left_semi")
      .withColumn("text", concat(col("text"), lit(" revised edition")))
    val seg1 = MinHashSegments.deleteSegOf(base, ids)
    val live1 = MinHashSegments.view(base, Seq(seg1))
    val seg2 = MinHashSegments.appendSegOf(live1, revisedDocs)
    val live2 = MinHashSegments.view(base, Seq(seg1, seg2))
    val resigned = NearDup.signatures(
      d.join(ids, Seq("doc_id"), "left_anti")
        .unionByName(revisedDocs))
    assert(sigKey(live2) == sigKey(resigned))
  }

  test("disk layout: O(delta) segment writes, read == view, compact == segmented") {
    val d = docs
    val root = java.nio.file.Files
      .createTempDirectory("mh_segs").toString
    MinHashSegments.init(
      NearDup.signatures(d.filter(col("doc_id") % 3 =!= 0)), root)

    def baseFiles(): Map[String, Long] = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$root/base"), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> f.getModificationTime
      }
      b.result()
    }
    val before = baseFiles()
    assert(before.nonEmpty)

    MinHashSegments.appendSeg(spark, root,
      d.filter(col("doc_id") % 3 === 0))
    MinHashSegments.deleteSeg(spark, root,
      d.select("doc_id").distinct().filter(col("doc_id") % 10 === 3))
    assert(baseFiles() == before,
      "segment maintenance rewrote base files — the O(delta) claim")
    assert(SegmentOps.listSegs(spark, root) == Seq(0, 1))

    val live = MinHashSegments.read(spark, root)
    val resigned = NearDup.signatures(d.filter(col("doc_id") % 10 =!= 3))
    assert(sigKey(live) == sigKey(resigned))

    val outRoot = java.nio.file.Files
      .createTempDirectory("mh_segs_c").toString
    MinHashSegments.compact(spark, root, outRoot)
    assert(SegmentOps.listSegs(spark, outRoot).isEmpty)
    assert(sigKey(MinHashSegments.read(spark, outRoot))
      == sigKey(resigned))
  }

  test("changesBetween: fast path == fallback == expected state diff") {
    val d = docs
    val root = java.nio.file.Files
      .createTempDirectory("mh_cdc").toString
    MinHashSegments.init(
      NearDup.signatures(d.filter(col("doc_id") % 4 <= 1)), root)
    MinHashSegments.appendSeg(spark, root,
      d.filter(col("doc_id") % 4 === 2))
    val vMid = SegmentOps.resolveSnapshot(spark, root).version
    // the window: a delete, an append, a CONTENT revise, and a
    // SAME-CONTENT revise (must report nothing — state diff, not log)
    val delIds = d.select("doc_id").distinct()
      .filter(col("doc_id") % 10 === 3)
    MinHashSegments.deleteSeg(spark, root, delIds)
    MinHashSegments.appendSeg(spark, root,
      d.filter(col("doc_id") % 4 === 3))
    val rv = d.filter(col("doc_id") % 4 === 0 &&
      col("doc_id") % 10 =!= 3 && col("doc_id") % 8 === 4 &&
      size(split(col("text"), " ")) >= 3)
    val sv = d.filter(col("doc_id") % 4 === 1 &&
      col("doc_id") % 10 =!= 3 && col("doc_id") % 8 === 5 &&
      size(split(col("text"), " ")) >= 3)
    assert(rv.count() > 0 && sv.count() > 0)
    // the revised text REPLACES the original (disjoint shingle set):
    // merely appending words only ADDS shingles, each permutation's
    // min can only decrease, and for long docs the whole signature
    // often survives unchanged — a correct state diff then reports
    // nothing, which is not the case this clause wants to pin
    MinHashSegments.deleteSeg(spark, root, rv.select("doc_id"))
    MinHashSegments.appendSeg(spark, root,
      rv.withColumn("text", concat(lit("v2 rewritten edition of doc "),
        col("doc_id").cast("string"), lit(" end"))))
    MinHashSegments.deleteSeg(spark, root, sv.select("doc_id"))
    MinHashSegments.appendSeg(spark, root, sv)
    val vEnd = SegmentOps.resolveSnapshot(spark, root).version
    def key(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val el = NearDup.signatures(d).select("doc_id")
    val expected =
      key(el.filter(col("doc_id") % 4 === 3)
          .withColumn("op", lit("added"))) ++
        key(el.filter(col("doc_id") % 4 <= 2 &&
            col("doc_id") % 10 === 3)
          .withColumn("op", lit("removed"))) ++
        key(rv.select("doc_id").withColumn("op", lit("updated")))
    val fast = MinHashSegments.changesBetween(spark, root, vMid, vEnd)
    assert(key(fast) == expected, "fast-path CDC drifted")
    // fold the early segments: the window no longer extends the
    // captured snapshot, so the SAME call must take the O(live)
    // content-diff fallback — and produce the identical state diff
    MinHashSegments.mergeSegs(spark, root, 3)
    val a = SegmentOps.resolveSnapshotAt(spark, root, vMid)
    val b = SegmentOps.resolveSnapshot(spark, root)
    assert(b.segs.take(a.segs.size) != a.segs,
      "merge should have broken the fast-path precondition")
    val slow = MinHashSegments
      .changesBetween(spark, root, vMid, b.version)
    assert(key(slow) == expected, "fallback CDC drifted")
    // an empty window reports no changes
    assert(MinHashSegments.changesBetween(spark, root, vEnd, vEnd)
      .count() == 0L)
  }

  test("view plan cost grows LINEARLY per segment — the priced LSM trade") {
    // the sparse/pq families' growth gate for the third family: an
    // append-only signature stack must cost a CONSTANT plan delta per
    // segment (empty tombstones elide their scoping anti-joins).
    // Union-of-signatures plans shuffle nowhere, so the metric is
    // physical-plan node lines.
    val d = docs
    val base = NearDup.signatures(d.filter(col("doc_id") % 4 === 0))
    var segs = Vector.empty[MinHashSegments.Seg]
    val costs = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- 1 to 3) {
      val live = if (segs.isEmpty) base
        else MinHashSegments.view(base, segs)
      segs = segs :+ MinHashSegments.appendSegOf(live,
        d.filter(col("doc_id") % 4 === i))
      costs += MinHashSegments.view(base, segs)
        .queryExecution.executedPlan.toString.linesIterator.size
    }
    val d1 = costs(1) - costs(0)
    val d2 = costs(2) - costs(1)
    assert(d1 == d2,
      s"minhash view growth is not linear in segments: $costs")
  }
}
