package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{AnnIndex, PqIndex, PqSegments, SegmentOps,
  SparseIndex, SparseSegments}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fully-ONLINE lifecycle (VERDICT r11 #1), run as real streams:
  * a SegmentIngest stream appends document shards into BOTH persisted
  * index layouts (sparse BM25 + IVFPQ) — with a kill and checkpoint
  * restart between micro-batches — while a FusedServeStream query
  * stream serves the hybrid funnel (retrieval fold with the
  * x104-promoted REFINED dense leg + rerankPack foreachBatch tail)
  * FROM manifest-resolved snapshots, and a
  * policy-fired compactInPlace flips both layouts BETWEEN ingest
  * batches while the query stream is LIVE. Pins:
  *  - snapshot consistency: the live query stream's answers — before
  *    AND after the flip and the next ingest batch — equal the batch
  *    funnel over the snapshot its views resolved (time-travel readAt
  *    reproduces that reference exactly);
  *  - convergence: a fresh query stream over the post-flip snapshots
  *    equals the funnel over from-scratch twins (sparse: full-corpus
  *    rebuild; dense: frozen-book base + one in-memory append — the
  *    families' own gated compositions);
  *  - exactly-once ingest: both layouts record both batchIds, a
  *    replayed batch is a recorded no-op, and the tagged segments
  *    make the crash-gap retry detectable (SegmentIngestSpec's
  *    contract, here under the composed load).
  * This is the deployable shape w12_online_funnel gates cross-engine
  * as a batch twin (oracle = rebuild-from-scratch funnel in DuckDB).
  */
class W12OnlineLifecycleSpec extends SparkSpec {

  private def key(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("ingest stream + live fused serve + compaction flip: snapshot-consistent, exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w12_spec")
    val sroot = s"$dir/sp"
    val proot = s"$dir/pq"
    val docs = Tables.documents(spark, sf).cache()
    val tf = SparseIndex.termFreqs(docs).cache()
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    SparseSegments.init(
      SparseIndex.build(tf.filter(col("doc_id") % 3 =!= 0)), sroot)
    PqSegments.init(
      PqIndex.build(e.filter(col("vec_id") % 3 =!= 0)), proot)

    // ---- the ingest stream: one micro-batch = one tagged appendSeg
    // per layout, batchId-idempotent
    val in = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val shardA = docs.filter(col("doc_id") % 6 === 0)
      .select("doc_id", "text")
    val shardB = docs.filter(col("doc_id") % 6 === 3)
      .select("doc_id", "text")
    def startIngest() = spark.readStream.schema(shardA.schema)
      .parquet(in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        SegmentIngest.once(spark, sroot, id)(tag =>
          SparseSegments.appendSeg(spark, sroot,
            SparseIndex.termFreqs(df), Some(tag)))
        SegmentIngest.once(spark, proot, id)(tag =>
          PqSegments.appendSeg(spark, proot,
            e.join(df.select(col("doc_id").as("vec_id")), "vec_id"),
            Some(tag)))
        ()
      }
      .start()

    val run1 = startIngest()
    try {
      shardA.coalesce(1).write.mode("append").parquet(in)
      run1.processAllAvailable()
    } finally run1.stop() // the kill between micro-batches

    // ---- the query stream: views resolved NOW (snapshot V1 =
    // base + shard A, manifest v2) and held across everything below
    val sV1 = SparseSegments.read(spark, sroot)
    val pV1 = PqSegments.read(spark, proot)
    val q = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"),
        col("norm")), "q_id")
      .cache()
    val embRel = e.select(col("vec_id"), col("emb"))
    val docChars = docs.select("doc_id", "n_chars")
    def funnelBatch(sIdx: SparseIndex.Index, pIdx: PqIndex.Index,
        qq: DataFrame): DataFrame =
      FusedServeStream.rerankPack(
        FusedServeStream.fuseBatch(
          SparseIndex.serve(SparseServeStream.queryTerms(
            qq.select("q_id", "text")), sIdx, FusedServeStream.FuseK),
          PqIndex.serveRefined(qq.select("q_id", "emb", "norm"), pIdx,
            embRel, k = FusedServeStream.FuseK)),
        embRel, docChars)
    val qin = s"$dir/qin"
    val qout = s"$dir/qout"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(qin))
    val qs1 = FusedServeStream.serveRefined(
      spark.readStream.schema(q.schema).parquet(qin), sV1, pV1, embRel)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/qckpt")
      .foreachBatch { (fdf: DataFrame, _: Long) =>
        FusedServeStream.rerankPack(fdf, embRel, docChars)
          .write.mode("append").parquet(qout)
        ()
      }
      .start()
    try {
      // wave 1 — served from V1
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(qin)
      qs1.processAllAvailable()

      // ---- the compaction flip, while the query stream is LIVE
      assert(SegmentOps.shouldCompact(spark, sroot, maxSegs = 1))
      SparseSegments.compactInPlace(spark, sroot)
      assert(SegmentOps.shouldCompact(spark, proot, maxSegs = 1))
      PqSegments.compactInPlace(spark, proot)

      // ---- ingest batch B lands AFTER the flip (checkpoint restart)
      val run2 = startIngest()
      try {
        shardB.coalesce(1).write.mode("append").parquet(in)
        run2.processAllAvailable()
      } finally run2.stop()

      // wave 2 through the SAME live stream: answers must stay
      // consistent with V1 — the flip and batch B are invisible to a
      // reader that resolved before them
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(qin)
      qs1.processAllAvailable()
    } finally qs1.stop()

    // reference: time travel back to V1 (manifest v2 on both layouts)
    val expectedV1 = key(funnelBatch(
      SparseSegments.readAt(spark, sroot, 2),
      PqSegments.readAt(spark, proot, 2), q))
    val served = key(spark.read.parquet(qout))
    assert(served.nonEmpty)
    assert(served == expectedV1,
      s"live stream drifted from its snapshot: missing=" +
        s"${(expectedV1 -- served).take(3)} extra=" +
        s"${(served -- expectedV1).take(3)}")

    // ---- a FRESH query stream over the post-flip snapshots must
    // equal the funnel over from-scratch twins: sparse = full-corpus
    // rebuild (final live = whole corpus), dense = frozen-book base +
    // one in-memory append of both shards
    val sV2 = SparseSegments.read(spark, sroot)
    val pV2 = PqSegments.read(spark, proot)
    val qout2 = s"$dir/qout2"
    val qs2 = FusedServeStream.serveRefined(
      spark.readStream.schema(q.schema).parquet(qin), sV2, pV2, embRel)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/qckpt2")
      .foreachBatch { (fdf: DataFrame, _: Long) =>
        FusedServeStream.rerankPack(fdf, embRel, docChars)
          .write.mode("append").parquet(qout2)
        ()
      }
      .start()
    try qs2.processAllAvailable() finally qs2.stop()
    val rebuilt = key(funnelBatch(
      SparseIndex.build(tf),
      PqIndex.append(PqIndex.build(e.filter(col("vec_id") % 3 =!= 0)),
        e.filter(col("vec_id") % 3 === 0)), q))
    val served2 = key(spark.read.parquet(qout2))
    assert(served2 == rebuilt,
      s"post-flip stream drifted from the from-scratch funnel: " +
        s"missing=${(rebuilt -- served2).take(3)} extra=" +
        s"${(served2 -- rebuilt).take(3)}")

    // ---- exactly-once bookkeeping on both layouts
    Seq(sroot, proot).foreach { root =>
      assert(SegmentIngest.ingested(spark, root, 0L))
      assert(SegmentIngest.ingested(spark, root, 1L))
      assert(!SegmentIngest.once(spark, root, 0L)(_ =>
        fail("replayed batch body must not run")))
      assert(SegmentOps.taggedSegs(spark, root,
        SegmentIngest.batchTag(1L)).nonEmpty,
        "batch 1's segment must carry its tag")
    }
  }
}
