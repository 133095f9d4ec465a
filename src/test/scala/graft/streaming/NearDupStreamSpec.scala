package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import graft.etl.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract for the streaming near-dup detector (st10's streaming twin):
  * the banded-bucket stateful fold must emit exactly the batch family's
  * verified in-horizon pairs (same signatures, same banding, same 12/16
  * verify), and its bucket state must be REMOVED once the watermark
  * passes a bucket's matchable window — content-hash bucket keys are
  * never revisited, so timeout-based removal is the only thing standing
  * between this operator and an unbounded state store.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val HorizonSec = 600L

  /** The st10 corpus: documents ∪ planted near-dups, with arrival
    * second 2k for original k and 2k+1 for its planted dup. */
  private def corpus: DataFrame = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate")).as("text"))
    docs.unionByName(dups)
      .withColumn("arr_s",
        when(col("doc_id") >= 1000000L,
          (col("doc_id") - 1000000L) * 2 + 1)
          .otherwise(col("doc_id") * 2))
      .withColumn("ts",
        (lit(1704067200L) + col("arr_s")).cast("timestamp"))
  }

  /** Verified in-horizon pairs oriented (late, early) by arrival —
    * straight from the batch library kernels st10 uses. */
  private def expectedPairs: Set[(Long, Long)] = {
    def arr(c: org.apache.spark.sql.Column) =
      when(c >= 1000000L, (c - 1000000L) * 2 + 1).otherwise(c * 2)
    NearDup.sigPairs(corpus.select("doc_id", "text"))
      .filter(col("sig_matches") >= NearDup.DefaultMinSig)
      .withColumn("arr_a", arr(col("doc_a")))
      .withColumn("arr_b", arr(col("doc_b")))
      .filter(abs(col("arr_b") - col("arr_a")) <= HorizonSec)
      .select(
        when(col("arr_a") < col("arr_b"), col("doc_b"))
          .otherwise(col("doc_a")).as("late"),
        when(col("arr_a") < col("arr_b"), col("doc_a"))
          .otherwise(col("doc_b")).as("early"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("step: in-batch matching orients by event time and gates on horizon") {
    val ts0 = new Timestamp(1704067200L * 1000L)
    def t(s: Long) = new Timestamp(ts0.getTime + s * 1000L)
    val sigA = Seq.fill(16)(7L)
    val sigB = sigA.updated(0, 9L).updated(1, 9L) // 14/16 agree
    val sigC = Seq.fill(16)(1L)                   // 0/16 vs A/B
    val rows = Seq(
      NearDupStream.BandRow("0:k", 30L, t(700), sigB), // late arrival,
      NearDupStream.BandRow("0:k", 10L, t(100), sigA), // out of order
      NearDupStream.BandRow("0:k", 20L, t(5000), sigA), // > horizon vs 10
      NearDupStream.BandRow("0:k", 40L, t(120), sigC)) // no agreement
    val state = org.apache.spark.sql.streaming.TestGroupState.create[
      NearDupStream.BucketState](
      org.apache.spark.api.java.Optional.empty[NearDupStream.BucketState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = NearDupStream.step(HorizonSec, 12)("0:k", rows.iterator,
      state).toSeq
    // only (30 dup-of 10): gap 600 <= horizon, oriented later-first
    assert(out.map(m => (m.doc_id, m.dup_of, m.gap_s)) ==
      Seq((30L, 10L, 600L)))
    assert(state.get.members.size == 4)
  }

  test("stream matches == batch library pairs on the st10 corpus") {
    val c = corpus.select("doc_id", "ts", "text").orderBy("ts")
    val expected = expectedPairs
    assert(expected.nonEmpty)

    // batch path of the same fold (state-free single invocation)
    val batchPairs = NearDupStream.matches(c, HorizonSec).collect()
      .map(m => (m.doc_id, m.dup_of)).toSet
    assert(batchPairs == expected)

    // real streaming query: ts-ordered chunks, one micro-batch each
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream")
    val in = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(c.schema).parquet(in)
    val q = NearDupStream.matches(stream, HorizonSec)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_matches").start()
    try {
      Seq(0L -> 400L, 400L -> 800L, 800L -> 4000L).foreach {
        case (lo, hi) =>
          c.filter(col("ts").cast("long") - 1704067200L >= lo &&
              col("ts").cast("long") - 1704067200L < hi)
            .coalesce(1).write.mode("append").parquet(in)
          q.processAllAvailable()
      }
      val streamed = spark.table("neardup_matches").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))
        .toSet
      assert(streamed == expected,
        s"missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("bucket state is removed once the watermark passes its window") {
    val c = corpus.select("doc_id", "ts", "text")
    val dir = java.nio.file.Files.createTempDirectory("neardup_evict")
    val in = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stream = spark.readStream.schema(c.schema).parquet(in)
    val q = NearDupStream.matches(stream, HorizonSec)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_evict").start()
    try {
      c.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val populated = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // ~4 buckets per doc; the full corpus must be in state now
      assert(populated > 1000, s"expected a populated store: $populated")
      // two far-future sentinels: the first advances the watermark past
      // every real bucket's (newest member + horizon) timeout, the
      // second triggers the batch in which those timeouts actually fire
      def sentinel(id: Long, s: Long) = Seq(
        (id, new Timestamp((1704067200L + s) * 1000L),
          s"sentinel $id unique text payload $id")).toDF("doc_id", "ts",
        "text")
      sentinel(9000001L, 100000L).write.mode("append").parquet(in)
      q.processAllAvailable()
      sentinel(9000002L, 100100L).write.mode("append").parquet(in)
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < 100,
        s"bucket state not evicted: $after rows (was $populated)")
    } finally q.stop()
  }
}
