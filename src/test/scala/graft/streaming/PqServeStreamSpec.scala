package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{AnnIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream ≡ batch contract for the online ANN serving path: the same
  * query slice served through PqServeStream (row-local probes +
  * stream-static candidate join + bounded-heap top-k) must agree rank
  * for rank — adc bit-identical — with the batch PqIndex.serve the
  * x97 oracle gates, no matter how the query stream is chunked into
  * micro-batches.
  */
class PqServeStreamSpec extends SparkSpec {

  private def key(rows: Array[org.apache.spark.sql.Row])
      : Set[(Long, Long, Long, Double, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
      r.getAs[Long]("rank"), r.getAs[Double]("adc"),
      r.getAs[Long]("n_scanned"))).toSet

  test("batch fold == PqIndex.serve, and a chunked stream == both") {
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val idx = PqIndex.build(e)
    // materialize the index tables the way a serving process loads
    // them (also isolates serve from the training lineage)
    val dir = java.nio.file.Files.createTempDirectory("pq_serve").toString
    PqIndex.write(idx, dir)
    val loaded = PqIndex.read(spark, dir)

    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("emb"), col("norm"))
      .cache()
    val batchLib = key(PqIndex.serve(q, loaded)
      .select("q_id", "vec_id", "rank", "adc", "n_scanned").collect())
    assert(batchLib.nonEmpty)

    // the stream module's fold on a BATCH frame
    val batchFold = key(PqServeStream.serve(q, loaded).toDF().collect())
    assert(batchFold == batchLib,
      s"batch fold drifted: ${(batchLib -- batchFold).take(3)}")

    // real streaming query, fed in two arbitrary chunks
    val qdir = java.nio.file.Files.createTempDirectory("pq_serve_q")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = PqServeStream.serve(stream, loaded)
      .writeStream.outputMode("append")
      .format("memory").queryName("pq_serve_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = key(spark.table("pq_serve_stream").collect())
      assert(streamed == batchLib,
        s"stream drifted: missing=${(batchLib -- streamed).take(3)} " +
          s"extra=${(streamed -- batchLib).take(3)}")
    } finally out.stop()
  }

  private def keyR(rows: Array[org.apache.spark.sql.Row])
      : Set[(Long, Long, Long, Double, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
      r.getAs[Long]("rank"), r.getAs[Double]("l2"),
      r.getAs[Long]("n_scanned"))).toSet

  test("refined: batch fold == PqIndex.serveRefined, and a chunked stream == both") {
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val idx = PqIndex.build(e)
    val dir = java.nio.file.Files
      .createTempDirectory("pq_serve_r").toString
    PqIndex.write(idx, dir)
    val loaded = PqIndex.read(spark, dir)
    val vecs = e.select(col("vec_id"), col("emb")).cache()

    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("emb"), col("norm"))
      .cache()
    val batchLib = keyR(PqIndex.serveRefined(q, loaded, vecs)
      .select(col("q_id"), col("vec_id"), col("rank"), col("l2"),
        col("n_scanned")).collect())
    assert(batchLib.nonEmpty)

    // the stream module's two-stage fold on a BATCH frame — l2 and
    // ties must be bit-identical to the library's deferred refine join
    val batchFold = keyR(
      PqServeStream.serveRefined(q, loaded, vecs).toDF().collect())
    assert(batchFold == batchLib,
      s"refined batch fold drifted: " +
        s"missing=${(batchLib -- batchFold).take(3)} " +
        s"extra=${(batchFold -- batchLib).take(3)}")

    // real streaming query, fed in two arbitrary chunks
    val qdir = java.nio.file.Files.createTempDirectory("pq_serve_rq")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = PqServeStream.serveRefined(stream, loaded, vecs)
      .writeStream.outputMode("append")
      .format("memory").queryName("pq_serve_refined_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = keyR(
        spark.table("pq_serve_refined_stream").collect())
      assert(streamed == batchLib,
        s"refined stream drifted: " +
          s"missing=${(batchLib -- streamed).take(3)} " +
          s"extra=${(streamed -- batchLib).take(3)}")
    } finally out.stop()
  }
}
