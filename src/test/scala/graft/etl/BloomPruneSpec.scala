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

  test("non-integral probe column is rejected loudly, not silently pruned") {
    val li = Tables.lineitem(spark, sf)
    val keys = Tables.orders(spark, sf).select("o_orderkey").limit(10)
    val bf = BloomPrune.build(keys, "o_orderkey", expectedKeys = 10L)
    // a string probe would cast non-numeric values to NULL and prune
    // every row — the misuse must fail analysis-side instead
    val e = intercept[IllegalArgumentException] {
      BloomPrune.mightContain(bf)(li("l_returnflag"))
    }
    assert(e.getMessage.contains("non-integral"))
    // integral probes of every width still pass
    BloomPrune.mightContain(bf)(li("l_orderkey"))          // long
    BloomPrune.mightContain(bf)(li("l_linenumber"))        // int
  }

  test("probe predicate compiles into the scan's whole-stage codegen") {
    val li = Tables.lineitem(spark, sf)
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 50 === 0).select("o_orderkey")
    val pruned = BloomPrune.prune(li, "l_orderkey", keys, "o_orderkey",
      expectedKeys = 1000L, fpp = 0.01)
    val plan = pruned.queryExecution.executedPlan.toString
    // The predicate must be Spark's codegen'd BloomFilterMightContain,
    // not a black-box ScalaUDF barrier between scan and filter.
    assert(plan.contains("might_contain"),
      s"expected bloom might_contain in plan:\n$plan")
    assert(!plan.contains("UDF"),
      s"probe must not be a udf barrier:\n$plan")
    // And the filter sits inside a WholeStageCodegen span: the Filter
    // node is numbered under a WholeStageCodegen id, which the plan
    // string renders as '*(N) Filter'.
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.trim.startsWith("*")),
      s"bloom filter left the codegen span:\n$plan")
  }
}
