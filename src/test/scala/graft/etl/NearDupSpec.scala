package graft.etl

import graft.SparkSpec

/** Library-level contract of [[NearDup]] on a corpus with KNOWN
  * cluster structure (the query-side oracles pin the family on real
  * data; this pins the API semantics a caller programs against). */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  // three exact-duplicate groups + two loners + a short doc; exact
  // copies have J = 1, so every in-group pair must survive ANY minSig
  private def mk(words: String, n: Int): String =
    Iterator.continually(words).take(n).mkString(" ")
  private lazy val docs = Seq(
    1L -> mk("alpha beta gamma delta", 8),
    2L -> mk("alpha beta gamma delta", 8),
    3L -> mk("alpha beta gamma delta", 8),
    10L -> mk("epsilon zeta eta theta", 8),
    11L -> mk("epsilon zeta eta theta", 8),
    20L -> mk("unique one words here", 8),
    21L -> mk("other singular content", 8),
    30L -> "too short" // < 3 words: no shingles, must never cluster
  ).toDF("doc_id", "text")

  test("clusters finds exactly the planted groups, min-id labeled") {
    val cl = NearDup.clusters(docs).as[(Long, Long)].collect().toMap
    assert(cl.keySet === Set(1L, 2L, 3L, 10L, 11L))
    assert(Set(1L, 2L, 3L).forall(cl(_) == 1L))
    assert(Set(10L, 11L).forall(cl(_) == 10L))
  }

  test("dedupe keeps min-id survivors plus all unclustered docs") {
    val kept = NearDup.dedupe(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 20L, 21L, 30L))
  }

  test("dedupe preserves input columns and rows verbatim") {
    val extra = docs.withColumn("src",
      org.apache.spark.sql.functions.lit("s1"))
    val out = NearDup.dedupe(extra)
    assert(out.columns.toSeq === Seq("doc_id", "text", "src"))
    assert(out.count() === 5L)
  }

  test("edges tighten monotonically with minSig") {
    val loose = NearDup.edges(docs, 1).count()
    val strict = NearDup.edges(docs, 16).count()
    assert(strict <= loose)
    // exact copies agree on all 16 slots: the planted pairs survive
    // even the strictest gate
    assert(strict >= 4L) // (1,2),(1,3),(2,3),(10,11)
  }
}
