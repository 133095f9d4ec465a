package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the runtime-filter pattern for
  * selective joins whose build side is too big to broadcast-join but
  * whose KEY SET fits a few-MB bitset.
  *
  * `prune(fact, "fk", keys, "pk")` builds a bloom filter over the key
  * side (one lightweight aggregation; `expectedKeys`/`fpp` size the
  * bitset) and filters the probe side BEFORE its shuffle. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling only the ~selectivity fraction that can possibly match —
  * the same idea as Spark's own `spark.sql.optimizer.runtime.bloomFilter`
  * injection, exposed as an explicit operator for when the optimizer's
  * thresholds don't fire (e.g. the key side is a computed relation with
  * no stats).
  *
  * False positives only ADD unpruned rows (the later join stays exact);
  * false negatives cannot happen — so correctness never depends on the
  * filter. The filter itself is built driver-side by `stat.bloomFilter`
  * (a tree-reduce of partition-local bitsets, bounded by the bitset
  * size, NOT by the key count) and ships to executors once via the udf
  * closure — for a 1% fpp on 10M keys that is ~11 MB, broadcast-sized.
  * The probe predicate is a non-codegen udf, deliberately placed
  * directly after the scan: it prunes before the expensive stages and
  * never sits inside a wider codegen pipeline.
  */
object BloomPrune {

  /** Build a bloom filter over `keys.keyCol` (long keys). An EMPTY key
    * side yields an empty filter (mightContain false for everything —
    * the semantically correct "prune all" answer); Spark's own
    * `stat.bloomFilter` NPEs on the null aggregate that case produces. */
  def build(keys: DataFrame, keyCol: String, expectedKeys: Long,
      fpp: Double = 0.01): BloomFilter =
    if (keys.isEmpty) BloomFilter.create(math.max(1L, expectedKeys), fpp)
    else keys.stat.bloomFilter(keyCol, expectedKeys, fpp)

  /** Predicate column: does `c` possibly appear in the filter? */
  def mightContain(bf: BloomFilter)(c: Column): Column = {
    val f = udf((v: Long) => bf.mightContain(v))
    f(c)
  }

  /** Prune `probe` down to rows whose `probeKey` might match a key in
    * `keys.keyCol`, then the caller joins exactly as before. */
  def prune(probe: DataFrame, probeKey: String, keys: DataFrame,
      keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build(keys, keyCol, expectedKeys, fpp)
    probe.filter(mightContain(bf)(probe(probeKey)))
  }
}
