package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The CMS kernel's contract: the distributed Aggregator build must be
  * bit-identical to the relational keyed-agg build x72 certifies
  * against DuckDB — same counters under ANY partitioning (merge is
  * commutative addition), and point estimates must obey the one-sided
  * guarantee against exact counts.
  */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  test("unit: reduce/merge build the same matrix in any order") {
    val cms = new CountMinSketch(2, 8)
    val xs = Seq(5L, 99L, 5L, 123456L, 99L, 5L)
    val whole = xs.foldLeft(cms.zero)(cms.reduce)
    val (l, r) = xs.splitAt(2)
    val halves = cms.merge(l.foldLeft(cms.zero)(cms.reduce),
      r.foldLeft(cms.zero)(cms.reduce))
    assert(whole.toSeq == halves.toSeq)
    // estimate of a seen value counts at least its occurrences
    assert(CountMinSketch.estimate(whole, 5L, 2, 8) >= 3L)
  }

  test("distributed build == relational x72 counters, any partitioning") {
    spark.udf.register("cms_sketch", udaf(new CountMinSketch()))
    val hashes = Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("tok"))
      .filter($"tok" =!= "")
      .withColumn("h", PolyHash($"tok"))
    // the relational counter matrix exactly as x72 builds it
    val relational = hashes.groupBy($"tok")
      .agg(count(lit(1)).as("cnt"), first($"h").as("h"))
      .select($"cnt", $"h", explode(array((0 until 4).map(r => struct(
        lit(r).as("r"),
        lit(CountMinSketch.A(r)).as("pa"),
        lit(CountMinSketch.B(r)).as("pb"))): _*)).as("p"))
      .select($"p.r".as("r"),
        expr(s"((h * p.pa + p.pb) % ${CountMinSketch.Mod}L) % 256")
          .as("b"), $"cnt")
      .groupBy($"r", $"b").agg(sum($"cnt").as("c"))
      .collect().map(x =>
        (x.getAs[Int]("r"), x.getAs[Long]("b")) -> x.getAs[Long]("c"))
      .toMap
    // the kernel build, once per partitioning — identical both times
    val sketches = Seq(3, 17).map { parts =>
      hashes.repartition(parts).select($"h".as[Long])
        .select(expr("cms_sketch(h)")).as[Array[Long]].head()
    }
    assert(sketches(0).toSeq == sketches(1).toSeq,
      "sketch must be partitioning-independent")
    val sk = sketches.head
    assert(sk.length == 4 * 256)
    (0 until 4).foreach { r =>
      (0 until 256).foreach { b =>
        assert(sk(r * 256 + b) == relational.getOrElse((r, b.toLong), 0L),
          s"counter ($r, $b) differs from the relational build")
      }
    }
  }
}
