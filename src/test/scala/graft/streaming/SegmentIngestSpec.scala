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
        SegmentIngest.once(spark, root, id) {
          MinHashSegments.appendSeg(spark, root, df)
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
      fail("replayed batch body must not run")
    }
    assert(!replayed)
    // and a NEW batchId still runs
    var ran = false
    assert(SegmentIngest.once(spark, root, 999L) { ran = true })
    assert(ran)
  }
}
