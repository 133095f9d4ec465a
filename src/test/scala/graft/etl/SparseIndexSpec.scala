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
    assert(tableKey(loaded.tf) == tableKey(idx.tf))
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

  test("delete is bit-identical to a rebuild without the docs (backfill exercised)") {
    val t = tf
    // LOW cap: every term's list overflows at sf0.001, so deleting docs
    // inside the top-cap forces the un-truncation backfill path
    val cap = 5
    val del = t.filter(col("doc_id") % 4 === 1).select("doc_id").distinct()
    assert(del.count() > 0)
    val deleted = SparseIndex.delete(SparseIndex.build(t, cap), del, cap)
    val rebuilt = SparseIndex.build(
      t.join(del, Seq("doc_id"), "left_anti"), cap)
    assert(tableKey(deleted.plist) == tableKey(rebuilt.plist),
      "posting lists drifted under delete (backfill wrong)")
    assert(tableKey(deleted.df) == tableKey(rebuilt.df),
      "df decrement drifted from a recount")
    assert(tableKey(deleted.dl) == tableKey(rebuilt.dl))
    assert(tableKey(deleted.stats) == tableKey(rebuilt.stats))
    assert(tableKey(deleted.tf) == tableKey(rebuilt.tf))
  }

  test("revise = delete + append round-trips to the revised rebuild") {
    val t = tf
    val cap = 5
    val revisedIds = t.filter(col("doc_id") % 7 === 2)
      .select("doc_id").distinct()
    // the revision: the same docs with every tf bumped by 1
    val revisedTf = t.join(revisedIds, Seq("doc_id"), "left_semi")
      .withColumn("tf", col("tf") + 1L)
    val viaLifecycle = SparseIndex.append(
      SparseIndex.delete(SparseIndex.build(t, cap), revisedIds, cap),
      revisedTf, cap)
    val rebuilt = SparseIndex.build(
      t.join(revisedIds, Seq("doc_id"), "left_anti")
        .unionByName(revisedTf), cap)
    assert(tableKey(viaLifecycle.plist) == tableKey(rebuilt.plist))
    assert(tableKey(viaLifecycle.df) == tableKey(rebuilt.df))
    assert(tableKey(viaLifecycle.stats) == tableKey(rebuilt.stats))
  }

  test("deleting ids absent from the corpus is a no-op") {
    import spark.implicits._
    val t = tf
    val idx = SparseIndex.build(t)
    val ghost = Seq(-999999L).toDF("doc_id")
    val after = SparseIndex.delete(idx, ghost)
    assert(tableKey(after.plist) == tableKey(idx.plist))
    assert(tableKey(after.stats) == tableKey(idx.stats))
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
