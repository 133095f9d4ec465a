package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SpaceSavingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("full-capacity sketch counts exactly") {
    val agg = new SpaceSavingTopK(16, 3)
    val buf = Seq("a", "b", "a", "c", "a", "b")
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).toSeq ==
      Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("eviction inherits the min count and records it as error") {
    val agg = new SpaceSavingTopK(2, 2)
    // "c" arrives on a full sketch: evicts min ("b",1), inherits 1+1
    val buf = Seq("a", "a", "b", "c").foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).toSeq
    assert(out == Seq(("a", 2L, 0L), ("c", 2L, 1L)))
    // guaranteed lower bound: count - error never exceeds truth
    assert(out.forall { case (_, c, e) => c - e >= 0 })
  }

  test("merge adds shared slots and prunes to capacity") {
    val agg = new SpaceSavingTopK(2, 2)
    val a = Map("x" -> ((5L, 0L)), "y" -> ((3L, 1L)))
    val b = Map("x" -> ((2L, 0L)), "z" -> ((4L, 0L)))
    val m = agg.merge(a, b)
    assert(m.size == 2)
    assert(m("x") == ((7L, 0L)))
    assert(m("z") == ((4L, 0L))) // y(3) pruned as the smallest
  }

  test("sketch top-k equals exact top-k on the skewed token stream") {
    val k = 10
    spark.udf.register("topk_sketch", udaf(new SpaceSavingTopK(8 * k, k)))
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "")
    // distributed: sketches build per-partition and merge — same API
    // shape as the 100 TB run (one fixed-size state per partition)
    val sketch = toks.repartition(8)
      .agg(expr("topk_sketch(tok)"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(k)
      .as[(String, Long)].collect().toSeq
    assert(sketch.map(_._1).toSeq == exact.map(_._1),
      s"sketch ${sketch.toSeq} != exact $exact")
    // at capacity 8k on this distribution the counts are exact too
    assert(sketch.toSeq == exact)
  }
}
