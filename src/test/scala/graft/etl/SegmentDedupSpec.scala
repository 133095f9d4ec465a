package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplate lines repeating across docs are dropped, order kept") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha beta\ngamma delta\nFOOTER NAV"),
      (2L, "COOKIE BANNER\nepsilon zeta\nFOOTER NAV"),
      (3L, "COOKIE BANNER\nalpha beta unique-to-three\nFOOTER NAV"))
      .toDF("doc_id", "text")
    val out = SegmentDedup.clean(docs, "doc_id",
        SegmentDedup.lines(col("text")), maxDf = 1, sep = "\n")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq == Seq(
      "alpha beta\ngamma delta", "epsilon zeta",
      "alpha beta unique-to-three"))
    assert(out.map(_.getAs[Long]("n_dropped")).toSeq == Seq(2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_segments")).toSeq == Seq(4L, 3L, 3L))
  }

  test("a doc of pure boilerplate comes back empty, not missing") {
    val docs = Seq((1L, "SAME"), (2L, "SAME"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = SegmentDedup.clean(docs, "doc_id",
      SegmentDedup.lines(col("text")), maxDf = 1)
    assert(out.count() == 3)
    assert(out.filter($"doc_id" === 1).collect()(0)
      .getAs[String]("clean_text") == "")
  }

  test("wordWindows segments in exact w-word chunks") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val segs = docs.select(posexplode(
      SegmentDedup.wordWindows(col("text"), 2)).as(Seq("i", "s")))
      .orderBy("i").as[(Int, String)].collect()
    assert(segs.map(_._2).toSeq == Seq("a b", "c d", "e"))
  }

  test("maxDf threshold: df == maxDf survives, df > maxDf drops") {
    val docs = Seq((1L, "twice"), (2L, "twice"), (3L, "thrice"),
      (4L, "thrice"), (5L, "thrice")).toDF("doc_id", "text")
    val out = SegmentDedup.clean(docs, "doc_id",
      SegmentDedup.lines(col("text")), maxDf = 2)
    assert(out.filter($"n_dropped" === 0).count() == 2) // the "twice" docs
    assert(out.filter($"n_dropped" === 1).count() == 3) // the "thrice" docs
  }
}
