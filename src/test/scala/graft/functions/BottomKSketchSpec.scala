package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BottomKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bottom-k keeps the k smallest distinct values") {
    val agg = new BottomKSketch(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 5L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq(1L, 2L, 3L, 5L))
    // merge respects the bound and ordering
    val other = Seq(0L, 6L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(buf, other).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("sketch-based Jaccard tracks exact Jaccard on document shingles") {
    val k = 64
    spark.udf.register("bottom_k", udaf(new BottomKSketch(k)))
    // two sources' token-hash sets from the documents table
    val toks = Tables.documents(spark, sf)
      .filter($"source".isin("src0", "src1"))
      .select($"source", explode(split($"text", " ")).as("token"))
      .withColumn("h", PolyHash($"token"))
    val sketches = toks.groupBy($"source")
      .agg(expr("bottom_k(h)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val est = BottomKSketch.estimateJaccard(
      sketches("src0"), sketches("src1"), k)
    val exact = {
      val a = toks.filter($"source" === "src0").select("h")
        .distinct().as[Long].collect().toSet
      val b = toks.filter($"source" === "src1").select("h")
        .distinct().as[Long].collect().toSet
      a.intersect(b).size.toDouble / a.union(b).size.toDouble
    }
    assert(math.abs(est - exact) < 0.25,
      s"estimate $est too far from exact $exact")
  }
}
