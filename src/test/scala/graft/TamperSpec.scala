package graft

import org.apache.spark.sql.functions._

/** x78's tamper-evidence contract: the manifest diff must flag
  * EXACTLY the shards that own a planted change (detection AND
  * specificity — an untouched shard's AdHash digest is bit-identical
  * across snapshots), and the root row must flip iff any shard did.
  */
class TamperSpec extends SparkSpec {

  test("manifest diff flags exactly the planted shards") {
    val rows = SparkEntry.defs.find(_.name == "x78_manifest_diff").get
      .run(spark, sf).collect()
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 101 === 7)
      .select((col("doc_id") % 16).as("shard")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "fixture must plant at least one change")
    val (rootRows, shardRows) = rows.partition(_.getLong(0) == -1L)
    assert(rootRows.length == 1 && shardRows.length == 16)
    shardRows.foreach { r =>
      val shard = r.getLong(0)
      val changed = r.getAs[Long]("changed") == 1L
      assert(changed == planted.contains(shard),
        s"shard $shard: changed=$changed but planted=${planted(shard)}")
      if (!changed)
        assert(r.getAs[Long]("digest_a") == r.getAs[Long]("digest_b"))
    }
    assert(rootRows.head.getAs[Long]("changed") == 1L,
      "root digest must flip when any shard changed")
  }
}
