package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("bloom-pruned join is exact and actually prunes the probe side") {
    val li = Tables.lineitem(spark, sf)
    // selective key side: ~2% of orders
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 50 === 0).select("o_orderkey")
    val nKeys = keys.count()

    val plain = li.join(keys, li("l_orderkey") === keys("o_orderkey"))
      .count()
    val pruned = BloomPrune.prune(li, "l_orderkey", keys, "o_orderkey",
      expectedKeys = nKeys, fpp = 0.01)
    val prunedJoin = pruned
      .join(keys, pruned("l_orderkey") === keys("o_orderkey")).count()

    // exactness: the filter can only drop non-matching rows
    assert(prunedJoin == plain)
    // effectiveness: the probe side shrinks to ~selectivity (+fpp)
    val total = li.count()
    val kept = pruned.count()
    assert(kept < total / 10,
      s"bloom kept $kept of $total — no pruning happened")
    // no false negatives: every true match survives the filter
    assert(kept >= prunedJoin)
  }
}
