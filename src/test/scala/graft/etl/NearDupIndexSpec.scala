package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deploy contract for the persisted MinHash index (x82's serve path):
  * signatures written to disk and read back must dedup an arriving
  * shard EXACTLY like freshly-computed ones, and the incremental edge
  * relation must agree with the full-corpus batch family on every
  * delta-sided pair — the property that makes "sign once, dedup each
  * shard against the store" safe to run forever.
  */
class NearDupIndexSpec extends SparkSpec {

  private def corpus: DataFrame = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate")).as("text"))
    docs.unionByName(dups)
  }

  test("write -> read -> incremental dedup == fresh signatures") {
    val base = corpus.filter(col("doc_id") < 1000000L)
    val delta = corpus.filter(col("doc_id") >= 1000000L)
    val dir = java.nio.file.Files.createTempDirectory("mh_index").toString
    NearDup.writeIndex(base, dir)
    val stored = NearDup.readIndex(spark, dir)
    assert(stored.count() > 0)

    val deltaSigs = NearDup.signatures(delta)
    def edges(baseSigs: DataFrame): Set[(Long, Long)] =
      NearDup.incrementalEdges(baseSigs, deltaSigs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = edges(NearDup.signatures(base))
    assert(fresh.nonEmpty)
    assert(edges(stored) == fresh,
      "persisted index dedups differently from fresh signatures")
  }

  test("incremental edges == the batch family's delta-sided verified pairs") {
    val base = corpus.filter(col("doc_id") < 1000000L)
    val delta = corpus.filter(col("doc_id") >= 1000000L)
    val incremental = NearDup.incrementalEdges(
      NearDup.signatures(base), NearDup.signatures(delta))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full-corpus batch pass: every verified pair whose later side is
    // a delta doc, oriented (delta, partner)
    val batch = NearDup.edges(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 >= 1000000L) // doc_a < doc_b: later side is doc_b
      .map { case (a, b) => (b, a) }.toSet
    assert(incremental == batch,
      s"missing=${(batch -- incremental).take(3)} " +
        s"extra=${(incremental -- batch).take(3)}")
  }
}
