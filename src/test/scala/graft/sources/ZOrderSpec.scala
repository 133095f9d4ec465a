package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves writeZOrdered's data-skipping claim with on-disk evidence:
  * after a z-order write on (l_orderkey, l_partkey), the per-FILE
  * min/max span of BOTH columns is a small fraction of the global
  * range — while a linear sort on l_orderkey leaves l_partkey's
  * per-file span at ~the full range (no skipping possible for partkey
  * predicates). Row-group stats pruning is driven by exactly these
  * spans, so narrow spans = files skipped.
  */
class ZOrderSpec extends SparkSpec {

  /** Mean per-file (max-min) span of `c`, as a fraction of the global
    * range, measured from the files actually written at `dir`. */
  private def meanSpanFrac(dir: String, c: String): Double = {
    val df = spark.read.parquet(dir)
    val Array(glo, ghi) = df.agg(min(col(c)).cast("double"),
      max(col(c)).cast("double")).head().toSeq.toArray.map(_
      .asInstanceOf[Double])
    val spans = df.groupBy(input_file_name().as("f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") /
        lit(ghi - glo)).as("frac"))
      .agg(avg(col("frac"))).head().getDouble(0)
    spans
  }

  private def li: DataFrame =
    Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey",
      "l_quantity")

  test("z-order write narrows per-file spans on BOTH dimensions") {
    val zdir = java.nio.file.Files.createTempDirectory("zorder")
      .toString + "/t"
    val ldir = java.nio.file.Files.createTempDirectory("linear")
      .toString + "/t"
    Sources.writeZOrdered(li, Seq("l_orderkey", "l_partkey"), zdir,
      numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(ldir)

    // the linear layout clusters its leading column tightly...
    assert(meanSpanFrac(ldir, "l_orderkey") < 0.2)
    // ...but leaves the second dimension unskippable (~full range)
    val linearPart = meanSpanFrac(ldir, "l_partkey")
    assert(linearPart > 0.8,
      s"baseline should be unclustered on partkey, got $linearPart")

    // z-order: both dimensions stay well under the full range, and
    // partkey improves on the linear layout by a wide margin
    val zOrder = meanSpanFrac(zdir, "l_orderkey")
    val zPart = meanSpanFrac(zdir, "l_partkey")
    assert(zOrder < 0.6, s"z-order l_orderkey span frac $zOrder")
    assert(zPart < 0.6, s"z-order l_partkey span frac $zPart")
    assert(zPart < linearPart / 2)

    // 16 range partitions -> 16 data files on disk
    val files = new java.io.File(zdir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 16)
  }

  test("z-order write preserves the data exactly") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_rt")
      .toString + "/t"
    Sources.writeZOrdered(li, Seq("l_orderkey", "l_partkey"), dir,
      numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_quantity"))
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }
}
