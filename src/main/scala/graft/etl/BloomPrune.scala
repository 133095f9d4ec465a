package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
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
  * size, NOT by the key count) and ships to executors once as a binary
  * literal — for a 1% fpp on 10M keys that is ~11 MB, broadcast-sized.
  * The probe predicate is Spark's own codegen'd
  * [[BloomFilterMightContain]] — the expression its runtime bloom
  * filters compile to — so the filter fuses into the scan's
  * whole-stage-codegen span instead of breaking it with a black-box
  * udf barrier (BloomPruneSpec pins the WSCG placement).
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

  /** Predicate column: does `c` possibly appear in the filter?
    * The filter travels as a foldable binary literal (the same wire
    * format BloomFilterAggregate emits), deserialized once per task
    * and probed inside generated code. */
  def mightContain(bf: BloomFilter)(c: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // cast the probe to long: BloomFilterMightContain type-checks a
    // LongType child only, while build() happily ingests int keys via
    // putLong — without the cast an IntegerType probe column fails
    // analysis. The cast preserves hash semantics (putLong both sides)
    // — but ONLY for integral probes. A string/double probe would
    // cast non-numeric values to NULL and silently prune every row
    // (the build() contract is long keys), so reject it loudly here
    // instead of losing data downstream.
    val expr = Bridge.expression(c)
    if (expr.resolved) expr.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"BloomPrune probes long keys; got $other — non-integral " +
          "probes would cast to NULL and silently prune every row")
    }
    Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      Bridge.expression(c.cast("long"))))
  }

  /** Prune `probe` down to rows whose `probeKey` might match a key in
    * `keys.keyCol`, then the caller joins exactly as before. */
  def prune(probe: DataFrame, probeKey: String, keys: DataFrame,
      keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build(keys, keyCol, expectedKeys, fpp)
    probe.filter(mightContain(bf)(probe(probeKey)))
  }
}
