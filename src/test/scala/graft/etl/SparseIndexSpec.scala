package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deploy contract for the persisted BM25 posting-list index (x88 build
  * card / x80 serve): the index written to disk and read back must
  * serve EXACTLY what the inline oracle-gated path computes, and the
  * incremental append must be bit-identical to a full rebuild — the
  * properties that make "tokenize once, serve and append forever" a
  * safe operating mode for the lexical retriever at 100 TB, symmetric
  * with AnnIndexSpec (dense) and NearDupIndexSpec (MinHash).
  */
class SparseIndexSpec extends SparkSpec {

  private def tf: DataFrame =
    SparseIndex.termFreqs(Tables.documents(spark, sf)).cache()

  private def qterms(tfRel: DataFrame, idx: SparseIndex.Index): DataFrame =
    tfRel.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("tok"))
      .join(idx.df, "tok").filter(col("df") >= 2)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("df").asc, col("tok"))))
      .filter(col("rk") <= 3)
      .select("q_id", "tok")

  private def servedKey(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("q_id", "doc_id", "rank", "score_ppm", "n_terms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  private def tableKey(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("write -> read -> serve is identical to the inline oracle-gated path") {
    val t = tf
    val idx = SparseIndex.build(t)
    val q = qterms(t, idx).cache()
    val inline = servedKey(SparseIndex.serve(q, idx))
    assert(inline.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("sparse_index").toString
    SparseIndex.write(idx, dir)
    val loaded = SparseIndex.read(spark, dir)
    assert(tableKey(loaded.plist) == tableKey(idx.plist))
    assert(tableKey(loaded.df) == tableKey(idx.df))
    assert(tableKey(loaded.stats) == tableKey(idx.stats))
    val served = servedKey(SparseIndex.serve(q, loaded))
    assert(served == inline,
      s"persisted-index serve drifted: ${(inline -- served).take(3)}")
  }

  test("append of a disjoint delta shard is bit-identical to a full rebuild") {
    val t = tf
    // a LOW cap so truncation is actually exercised at sf0.001 (the
    // corpus vocabulary is ~31 stop-word terms — every list overflows)
    val cap = 5
    val base = t.filter(col("doc_id") % 3 =!= 0)
    val delta = t.filter(col("doc_id") % 3 === 0)
    assert(delta.count() > 0 && base.count() > 0)
    val appended = SparseIndex.append(SparseIndex.build(base, cap), delta, cap)
    val rebuilt = SparseIndex.build(t, cap)
    assert(tableKey(appended.plist) == tableKey(rebuilt.plist),
      "posting lists drifted under append")
    assert(tableKey(appended.df) == tableKey(rebuilt.df))
    assert(tableKey(appended.dl) == tableKey(rebuilt.dl))
    assert(tableKey(appended.stats) == tableKey(rebuilt.stats))
  }

  test("append rejects overlapping doc_ids (revise = delete + append)") {
    val t = tf
    val idx = SparseIndex.build(t)
    val e = intercept[IllegalArgumentException] {
      SparseIndex.append(idx, t.limit(1))
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
