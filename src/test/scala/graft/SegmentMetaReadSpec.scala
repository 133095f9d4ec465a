package graft

import org.apache.spark.sql.functions._

import graft.etl.SegmentOps

/** Driver-side parquet metadata reads (SegmentOps.footerRows /
  * readMetaInt) must return exactly what the Spark-job path returns —
  * they replace `spark.read.parquet(...).count()` / `.head()` in the
  * lifecycle operators' metadata lookups, so a divergence would move
  * measured oracle cells. */
class SegmentMetaReadSpec extends SparkSpec {

  test("footerRows equals spark count on plain, multi-dir, " +
    "partitioned and empty tables") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_metaread").toString
    val a = spark.range(123).select(col("id").as("doc_id"),
      (col("id") % 7).as("k"))
    val b = spark.range(45).select(col("id").as("doc_id"),
      (col("id") % 3).as("k"))
    val empty = SegmentOps.emptyLike(a)
    graft.sources.Sources.writeOrdered(
      Seq("a" -> a, "b" -> b, "empty" -> empty,
        "part" -> a.repartition(3, col("k"))),
      dir, partitions = Map("part" -> Seq("k")))
    for (t <- Seq("a", "b", "empty", "part")) {
      val viaJob = spark.read.parquet(s"$dir/$t").count()
      assert(SegmentOps.footerRows(spark, Seq(s"$dir/$t")) === viaJob,
        s"table $t")
    }
    // multi-path form, and the empty-input contract
    val multi = Seq(s"$dir/a", s"$dir/b")
    assert(SegmentOps.footerRows(spark, multi) ===
      spark.read.parquet(multi: _*).count())
    assert(SegmentOps.footerRows(spark, Seq.empty) === 0L)
  }

  test("readMetaInt equals the Spark head() read of a meta table") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_metaread2").toString
    graft.sources.Sources.writeOrdered(
      Seq("meta" -> spark.range(1).select(lit(37).as("cap"),
        lit(16).as("k"))), dir)
    assert(SegmentOps.readMetaInt(spark, s"$dir/meta", "cap") === 37)
    assert(SegmentOps.readMetaInt(spark, s"$dir/meta", "k") === 16)
    assert(SegmentOps.readMetaInt(spark, s"$dir/meta", "cap") ===
      spark.read.parquet(s"$dir/meta").select("cap").head().getInt(0))
  }
}
