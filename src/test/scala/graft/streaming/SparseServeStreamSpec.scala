package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.SparseIndex
import org.apache.spark.sql.functions._

/** Stream ≡ batch contract for the online BM25 serving path: the same
  * query-term relation served through SparseServeStream (stream-static
  * plist/df/dl joins + literal corpus card + one flatMapGroupsWithState
  * top-k fold) must agree rank for rank — score_ppm bit-identical —
  * with the batch SparseIndex.serve that x80/x98 gate cross-engine, no
  * matter how the query stream is chunked into micro-batches. Also
  * pins the row-local tokenizer to the index's termFreqs contract.
  */
class SparseServeStreamSpec extends SparkSpec {

  private def key(rows: Array[org.apache.spark.sql.Row])
      : Set[(Long, Long, Long, Long, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("rank"), r.getAs[Long]("score_ppm"),
      r.getAs[Long]("n_terms"))).toSet

  test("queryTerms == termFreqs' distinct toks on the same slice") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 50 === 0)
    val fromText = SparseServeStream.queryTerms(
      docs.select(col("doc_id").as("q_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromTf = SparseIndex.termFreqs(docs)
      .select(col("doc_id").as("q_id"), col("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromText == fromTf)
    assert(fromText.nonEmpty)
  }

  test("batch fold == SparseIndex.serve, and a chunked stream == both") {
    val tf = SparseIndex.termFreqs(Tables.documents(spark, sf))
    val idx = SparseIndex.build(tf)
    // materialize the index tables the way a serving process loads
    // them (also isolates serve from the build lineage)
    val dir = java.nio.file.Files.createTempDirectory("sp_serve").toString
    SparseIndex.write(idx, dir)
    val loaded = SparseIndex.read(spark, dir)

    val q = SparseServeStream.queryTerms(
      Tables.documents(spark, sf).filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"), col("text"))).cache()
    val batchLib = key(SparseIndex.serve(q, loaded).collect())
    assert(batchLib.nonEmpty)

    // the stream module's fold on a BATCH frame
    val batchFold = key(SparseServeStream.serve(q, loaded).toDF().collect())
    assert(batchFold == batchLib,
      s"batch fold drifted: missing=${(batchLib -- batchFold).take(3)} " +
        s"extra=${(batchFold -- batchLib).take(3)}")

    // real streaming query terms, fed in two arbitrary chunks (a
    // query's terms never straddle a chunk — the endpoint contract:
    // one request arrives whole)
    val qdir = java.nio.file.Files.createTempDirectory("sp_serve_q")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = SparseServeStream.serve(stream, loaded)
      .writeStream.outputMode("append")
      .format("memory").queryName("sp_serve_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = key(spark.table("sp_serve_stream").collect())
      assert(streamed == batchLib,
        s"stream drifted: missing=${(batchLib -- streamed).take(3)} " +
          s"extra=${(streamed -- batchLib).take(3)}")
    } finally out.stop()
  }
}
