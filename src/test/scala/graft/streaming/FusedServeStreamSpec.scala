package graft.streaming

import graft.{SparkSpec, Tables}
import graft.etl.{AnnIndex, PqIndex, SparseIndex}
import org.apache.spark.sql.functions._

/** Stream ≡ batch contract for the online hybrid (sparse + dense)
  * serving path: the same multimodal query slice fused through
  * FusedServeStream's single stateful fold must agree rank for rank —
  * rrf_score, leg ranks and tiebreaks bit-identical — with
  * [[FusedServeStream.fuseBatch]] over the two batch serves the
  * oracles gate (SparseIndex.serve via x80/x98, PqIndex.serve via
  * x97), no matter how the query stream is chunked.
  */
class FusedServeStreamSpec extends SparkSpec {

  private def key(rows: Array[org.apache.spark.sql.Row])
      : Set[(Long, Long, Long, Long, Long, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("fused_rank"), r.getAs[Long]("rrf_score"),
      r.getAs[Long]("r_sparse"), r.getAs[Long]("r_dense"))).toSet

  test("stream fold == fuseBatch over the two gated serves") {
    val spIdx = SparseIndex.build(
      SparseIndex.termFreqs(Tables.documents(spark, sf)))
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val pqIdx = PqIndex.build(e)
    val spDir = java.nio.file.Files.createTempDirectory("fu_sp").toString
    val pqDir = java.nio.file.Files.createTempDirectory("fu_pq").toString
    SparseIndex.write(spIdx, spDir)
    PqIndex.write(pqIdx, pqDir)
    val spL = SparseIndex.read(spark, spDir)
    val pqL = PqIndex.read(spark, pqDir)

    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"), col("norm")),
        "q_id")
      .cache()

    val batch = key(FusedServeStream.fuseBatch(
      SparseIndex.serve(SparseServeStream.queryTerms(
        q.select("q_id", "text")), spL, FusedServeStream.FuseK),
      PqIndex.serve(q.select("q_id", "emb", "norm"), pqL,
        k = FusedServeStream.FuseK)).collect())
    assert(batch.nonEmpty)

    val fold = key(FusedServeStream.serve(q, spL, pqL).toDF().collect())
    assert(fold == batch,
      s"batch fold drifted: missing=${(batch -- fold).take(3)} " +
        s"extra=${(fold -- batch).take(3)}")

    val qdir = java.nio.file.Files.createTempDirectory("fu_q")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = FusedServeStream.serve(stream, spL, pqL)
      .writeStream.outputMode("append")
      .format("memory").queryName("fused_serve_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = key(spark.table("fused_serve_stream").collect())
      assert(streamed == batch,
        s"stream drifted: missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    } finally out.stop()
  }

  test("restart from checkpoint: parquet-sink output == batch, exactly once") {
    // the deployment shape: file source -> fused serve -> parquet
    // sink under a checkpoint; the process dies between micro-batches
    // and a fresh query resumes from the checkpoint. Exactly-once =
    // the final sink holds each query's top-k once, bit-identical to
    // the batch composition — no dropped chunk, no replayed dupes.
    val spIdx = SparseIndex.build(
      SparseIndex.termFreqs(Tables.documents(spark, sf)))
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val pqIdx = PqIndex.build(e)
    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"), col("norm")),
        "q_id")
      .cache()
    val batch = key(FusedServeStream.serve(q, spIdx, pqIdx)
      .toDF().collect())
    assert(batch.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("fu_restart")
    val in = s"$dir/in"
    val outP = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def start() = FusedServeStream.serve(
      spark.readStream.schema(q.schema).parquet(in), spIdx, pqIdx)
      .toDF().writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt).option("path", outP).start()

    val run1 = start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      run1.processAllAvailable()
    } finally run1.stop()
    val run2 = start() // the restarted process
    try {
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      run2.processAllAvailable()
    } finally run2.stop()

    val sunk = spark.read.parquet(outP).collect()
    assert(sunk.length == batch.size, // set-equality AND no dupes
      s"exactly-once violated: ${sunk.length} rows vs ${batch.size}")
    assert(key(sunk) == batch,
      s"restarted stream drifted: ${(batch -- key(sunk)).take(3)}")
  }

  test("foreachBatch rerank+pack tail: streamed final answers == batch funnel, restart-safe") {
    // VERDICT r10 #6: the funnel's assembly tier (MaxSim rerank +
    // greedy packing) closes ONLINE as a pure per-micro-batch
    // transform behind the retrieval fold. Gate: fused top-FuseK →
    // rerankPack streamed across micro-batch boundaries — WITH a kill
    // and checkpoint-resume between them — equals the batch funnel
    // tail row for row (rr_rank, maxsim tiebreaks, picked cut).
    val spIdx = SparseIndex.build(
      SparseIndex.termFreqs(Tables.documents(spark, sf)))
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val pqIdx = PqIndex.build(e)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .cache()
    val docChars = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).cache()
    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"), col("norm")),
        "q_id")
      .cache()

    def finalKey(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Long, Long, Long, Boolean)] =
      df.select("q_id", "doc_id", "rr_rank", "cum_chars", "picked")
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("rr_rank"), r.getAs[Long]("cum_chars"),
          r.getAs[Boolean]("picked"))).toSet

    val batch = finalKey(FusedServeStream.rerankPack(
      FusedServeStream.serve(q, spIdx, pqIdx,
        k = FusedServeStream.FuseK).toDF(), emb, docChars))
    assert(batch.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("fu_tail")
    val in = s"$dir/in"
    val outP = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def start() = FusedServeStream.serve(
      spark.readStream.schema(q.schema).parquet(in), spIdx, pqIdx,
      k = FusedServeStream.FuseK)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (fused: org.apache.spark.sql.DataFrame,
          _: Long) =>
        FusedServeStream.rerankPack(fused, emb, docChars)
          .write.mode("append").parquet(outP)
      }
      .start()

    val run1 = start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      run1.processAllAvailable()
    } finally run1.stop() // the kill between micro-batches
    val run2 = start()
    try {
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      run2.processAllAvailable()
    } finally run2.stop()

    val sunk = spark.read.parquet(outP)
    assert(sunk.count() == batch.size,
      s"exactly-once violated: ${sunk.count()} rows vs ${batch.size}")
    assert(finalKey(sunk) == batch,
      s"streamed funnel tail drifted from the batch assembly: " +
        s"missing=${(batch -- finalKey(sunk)).take(3)}")
  }

  test("refined hybrid: stream fold == fuseBatch over SparseIndex.serve x PqIndex.serveRefined") {
    // w07b's online twin (the x104-promoted two-stage dense leg): the
    // refined fused fold must agree rank for rank with the batch
    // composition of the two gated serves, chunk-independent.
    val spIdx = SparseIndex.build(
      SparseIndex.termFreqs(Tables.documents(spark, sf)))
    val e = AnnIndex.prep(Tables.embeddings(spark, sf)).cache()
    val pqIdx = PqIndex.build(e)
    val vecs = e.select(col("vec_id"), col("emb")).cache()
    val q = Tables.documents(spark, sf)
      .filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(e.select(col("vec_id").as("q_id"), col("emb"), col("norm")),
        "q_id")
      .cache()

    val batch = key(FusedServeStream.fuseBatch(
      SparseIndex.serve(SparseServeStream.queryTerms(
        q.select("q_id", "text")), spIdx, FusedServeStream.FuseK),
      PqIndex.serveRefined(q.select("q_id", "emb", "norm"), pqIdx,
        vecs, k = FusedServeStream.FuseK)).collect())
    assert(batch.nonEmpty)

    val fold = key(
      FusedServeStream.serveRefined(q, spIdx, pqIdx, vecs)
        .toDF().collect())
    assert(fold == batch,
      s"refined batch fold drifted: missing=${(batch -- fold).take(3)} " +
        s"extra=${(fold -- batch).take(3)}")

    val qdir = java.nio.file.Files.createTempDirectory("fu_refined_q")
    val in = s"$qdir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(q.schema).parquet(in)
    val out = FusedServeStream.serveRefined(stream, spIdx, pqIdx, vecs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fused_refined_stream").start()
    try {
      q.filter(col("q_id") % 200 === 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      q.filter(col("q_id") % 200 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      out.processAllAvailable()
      val streamed = key(spark.table("fused_refined_stream").collect())
      assert(streamed == batch,
        s"refined stream drifted: " +
          s"missing=${(batch -- streamed).take(3)} " +
          s"extra=${(streamed -- batch).take(3)}")
    } finally out.stop()
  }
}
