package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch aggregator: a d×w matrix of counters over a
  * pre-hashed Long stream. `estimate(h)` = min over rows of the
  * counter at that row's bucket — always ≥ the true count (hash
  * collisions only ADD), within ~N/w of it with per-row Markov
  * probability ≥ 3/4, amplified by the min across rows.
  *
  * The custom-aggregate extension path
  * (`org.apache.spark.sql.expressions.Aggregator`): usable as a typed
  * TypedColumn via `.toColumn` or registered with
  * `spark.udf.register("cms", udaf(new CountMinSketch()))`. The buffer
  * is one flat `Array[Long]` of d·w counters — fixed size regardless
  * of the domain, and `merge` is element-wise addition, so partial
  * sketches combine map-side in any order (the mergeable-sketch
  * contract). At 100 TB: d·w longs shuffle per group instead of the
  * full (element, count) relation.
  *
  * Bucketing is the SAME affine family the relational x72 query (and
  * its DuckDB oracle) uses — `((h * A(r) + B(r)) % P) % w` over the
  * oracle-portable [[PolyHash]] — so a sketch built here is
  * bit-identical to one built by the keyed-aggregation plan
  * (CountMinSketchSpec pins that equivalence; distinct multipliers
  * per row are the x53 weak-mixing lesson).
  */
class CountMinSketch(val d: Int = CountMinSketch.DefaultD,
    val w: Int = CountMinSketch.DefaultW)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(d <= CountMinSketch.A.length,
    s"at most ${CountMinSketch.A.length} hash rows are parameterized")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < d) {
      buf(r * w + CountMinSketch.bucket(h, r, w)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  final val DefaultD = 4
  final val DefaultW = 256
  final val Mod = 1000000007L
  // the same per-row affine parameters as x72's relational build
  final val A: Array[Long] = Array(1000003L, 100003L, 10007L, 1009L)
  final val B: Array[Long] = Array(12345L, 54321L, 7L, 999983L)

  /** Row r's bucket for pre-hashed value `h` (h must be in [0, Mod)). */
  def bucket(h: Long, r: Int, w: Int): Int =
    (((h * A(r) + B(r)) % Mod) % w).toInt

  /** Point estimate for pre-hashed value `h` from a finished sketch. */
  def estimate(sketch: Array[Long], h: Long, d: Int = DefaultD,
      w: Int = DefaultW): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + bucket(h, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
