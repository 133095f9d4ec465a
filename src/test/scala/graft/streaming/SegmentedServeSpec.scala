package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{AnnIndex, MinHashSegments, NearDup, PqIndex,
  PqSegments, SparseIndex, SparseSegments}
import org.apache.spark.sql.functions._

/** The operating loop the segment layer exists for: nightly O(delta)
  * maintenance (append + delete segments, base files immutable) with
  * CONTINUOUS serving — the online hybrid endpoint reads the
  * segmented live views directly, no compaction required first. The
  * static side of the stream-static joins is now a multi-segment
  * composition (scoped anti-joins, telescoping df sums, lazy
  * re-truncation), so this also pins that the whole view plan is
  * legal and bit-exact as a streaming join side. Equivalence chain:
  * chunked stream over segmented views ≡ fuseBatch over the same
  * views ≡ fuseBatch over fold-in indexes (the segment specs' view ≡
  * fold-in theorems, composed).
  */
class SegmentedServeSpec extends SparkSpec {

  private def key(rows: Array[org.apache.spark.sql.Row])
      : Set[(Long, Long, Long, Long, Long, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("fused_rank"), r.getAs[Long]("rrf_score"),
      r.getAs[Long]("r_sparse"), r.getAs[Long]("r_dense"))).toSet

  test("fused stream serves from segmented sparse+pq layouts after append+delete") {
    val d = Tables.documents(spark, sf).cache()
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val del = d.select("doc_id").distinct()
      .filter(col("doc_id") % 10 === 3).cache()

    // nightly maintenance on disk: base(2/3) + append-seg(1/3) +
    // delete-seg for both families
    val spRoot = java.nio.file.Files
      .createTempDirectory("seg_serve_sp").toString
    SparseSegments.init(SparseIndex.build(SparseIndex.termFreqs(
      d.filter(col("doc_id") % 3 =!= 0))), spRoot)
    SparseSegments.appendSeg(spark, spRoot, SparseIndex.termFreqs(
      d.filter(col("doc_id") % 3 === 0)))
    SparseSegments.deleteSeg(spark, spRoot, del)

    val pqRoot = java.nio.file.Files
      .createTempDirectory("seg_serve_pq").toString
    PqSegments.init(PqIndex.build(e.filter(col("vec_id") % 3 =!= 0)),
      pqRoot)
    PqSegments.appendSeg(spark, pqRoot,
      e.filter(col("vec_id") % 3 === 0))
    PqSegments.deleteSeg(spark, pqRoot,
      del.select(col("doc_id").as("vec_id")))

    // (the MinHash layout participates in the nightly too — cheap
    // sanity that its live view reads back under the same churn)
    val mhRoot = java.nio.file.Files
      .createTempDirectory("seg_serve_mh").toString
    MinHashSegments.init(
      NearDup.signatures(d.filter(col("doc_id") % 3 =!= 0)), mhRoot)
    MinHashSegments.appendSeg(spark, mhRoot,
      d.filter(col("doc_id") % 3 === 0))
    MinHashSegments.deleteSeg(spark, mhRoot, del)
    assert(MinHashSegments.read(spark, mhRoot).count() > 0)

    val spL = SparseSegments.read(spark, spRoot)
    val pqL = PqSegments.read(spark, pqRoot)

    // surviving-corpus probes with both modalities
    val q = d.filter(col("doc_id") % 100 === 0)
      .join(del, Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"),
        col("norm")), "q_id")
      .cache()

    val batch = key(FusedServeStream.fuseBatch(
      SparseIndex.serve(SparseServeStream.queryTerms(
        q.select("q_id", "text")), spL, FusedServeStream.FuseK),
      PqIndex.serve(q.select("q_id", "emb", "norm"), pqL,
        k = FusedServeStream.FuseK)).collect())
    assert(batch.nonEmpty)

    val qdir = java.nio.file.Files.createTempDirectory("seg_serve_q")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = FusedServeStream.serve(stream, spL, pqL)
      .writeStream.outputMode("append")
      .format("memory").queryName("seg_serve_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = key(spark.table("seg_serve_stream").collect())
      assert(streamed == batch,
        s"stream over segmented views drifted: " +
          s"missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    } finally out.stop()
  }
}
