package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    ("a", 0L, 10L),    // within one bucket (width 8: buckets 0,1)
    ("b", 5L, 30L),    // spans several buckets
    ("c", 100L, 100L)) // degenerate single-point interval
    .toDF("iv", "s", "e")

  test("containment is exact and boundary-inclusive") {
    val points = Seq(0L, 5L, 10L, 11L, 30L, 31L, 99L, 100L).toDF("p")
    val out = RangeJoin
      .pointInInterval(points, intervals, "p", "s", "e", bucketWidth = 8L)
      .select("p", "iv").as[(Long, String)].collect().toSet
    assert(out == Set((0L, "a"), (5L, "a"), (10L, "a"), (5L, "b"),
      (10L, "b"), (11L, "b"), (30L, "b"), (100L, "c")))
  }

  test("each matching pair appears exactly once despite multi-bucket spans") {
    val points = Seq(7L).toDF("p") // inside both a and b
    val out = RangeJoin
      .pointInInterval(points, intervals, "p", "s", "e", bucketWidth = 2L)
    assert(out.count() == 2) // once per interval, no bucket duplicates
  }

  test("extra equality keys partition the ranges") {
    val iv = Seq(("u1", 0L, 10L), ("u2", 0L, 10L)).toDF("user", "s", "e")
    val pts = Seq(("u1", 5L), ("u2", 7L), ("u3", 5L)).toDF("user", "p")
    val out = RangeJoin.pointInInterval(pts, iv, "p", "s", "e", 4L,
      keys = Seq("user"))
    assert(out.select("user", "p").as[(String, Long)].collect().toSet ==
      Set(("u1", 5L), ("u2", 7L)))
  }

  test("an interval wider than the bucket cap fails fast") {
    val iv = Seq(("wide", 0L, 100000L)).toDF("iv", "s", "e")
    val pts = Seq(50L).toDF("p")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, iv, "p", "s", "e", 2L,
        maxBucketsPerInterval = 64).count()
    }
    assert(e.getMessage.contains("RangeJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("RangeJoin")))
  }

  test("intervalOverlap matches the naive inequality join exactly once") {
    val left = Seq(("l1", 0L, 10L), ("l2", 8L, 40L), ("l3", 100L, 120L))
      .toDF("l", "ls", "le")
    val right = Seq(("r1", 10L, 20L), ("r2", 35L, 36L), ("r3", 50L, 99L),
      ("r4", 0L, 200L)).toDF("r", "rs", "re")
    // small bucket width forces multi-bucket intervals and shared spans
    val out = RangeJoin.intervalOverlap(left, right,
        "ls", "le", "rs", "re", bucketWidth = 4L)
      .select("l", "r").as[(String, String)].collect().toList
    val naive = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l", "r").as[(String, String)].collect().toSet
    // same pair set AND no duplicates from shared buckets
    assert(out.toSet == naive, s"got ${out.toSet}, want $naive")
    assert(out.size == out.toSet.size, "pair emitted more than once")
    // boundary touch counts as overlap (l1/r1 meet only at point 10)
    assert(out.toSet.contains(("l1", "r1")))
  }

  test("intervalOverlap honors extra equality keys") {
    val left = Seq(("u1", 0L, 10L), ("u2", 0L, 10L)).toDF("user", "ls", "le")
    val right = Seq(("u1", 5L, 15L), ("u3", 5L, 15L)).toDF("user", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, right,
        "ls", "le", "rs", "re", bucketWidth = 4L, keys = Seq("user"))
      .select("user").as[String].collect().toList
    assert(out == List("u1"))
  }
}
