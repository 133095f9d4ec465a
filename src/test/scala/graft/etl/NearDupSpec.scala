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
    val loose = NearDup.edges(docs,
      NearDup.LshConfig(4, 4, minSig = 1)).count()
    val strict = NearDup.edges(docs,
      NearDup.LshConfig(4, 4, minSig = 16)).count()
    assert(strict <= loose)
    // exact copies agree on all 16 slots: the planted pairs survive
    // even the strictest gate
    assert(strict >= 4L) // (1,2),(1,3),(2,3),(10,11)
  }

  // a corpus with GRADED similarity so the bandings can disagree:
  // base docs plus variants sharing a decreasing fraction of text
  private lazy val graded = {
    val base = (0 until 8).map(g =>
      (g * 100L) -> mk(s"base$g alpha$g beta$g gamma$g delta$g", 6))
    val vars = (0 until 8).flatMap { g =>
      (1 to 3).map { v =>
        (g * 100L + v) ->
          (mk(s"base$g alpha$g beta$g gamma$g delta$g", 6 - v) + " " +
            mk(s"noise$g$v filler$g$v extra$g$v pad$g$v", v))
      }
    }
    (base ++ vars).toDF("doc_id", "text")
  }

  test("finer banding of the same family nests: 4x4 candidates are a " +
      "subset of 8x2, and knees order recall-first < default < strict") {
    val c44 = NearDup.candidates(NearDup.signatures(graded),
      NearDup.LshConfig(4, 4, 12))
      .as[(Long, Long)].collect().toSet
    val c82 = NearDup.candidates(NearDup.signatures(graded),
      NearDup.LshConfig(8, 2, 12))
      .as[(Long, Long)].collect().toSet
    // a 4-row band match forces both of its 2-row halves to match —
    // guaranteed containment, not a statistical tendency
    assert(c44.subsetOf(c82),
      s"4x4 produced pairs outside 8x2: ${c44.diff(c82)}")
    // the flat banding must actually widen the net on graded sims
    assert(c82.size > c44.size,
      s"expected extra low-J candidates from 8x2 (both ${c44.size})")
    val knees = Seq(NearDup.LshConfig(8, 2, 12),
      NearDup.DefaultConfig, NearDup.LshConfig(2, 8, 12)).map(_.knee)
    assert(knees == knees.sorted && knees.distinct.size == 3)
  }

  test("k < 16 configs work end-to-end: 3x4 (k=12) recovers " +
      "exact-copy clusters with a 12-slot signature") {
    val cfg = NearDup.LshConfig(3, 4, minSig = 12)
    assert(cfg.k == 12)
    // signatures carry exactly k columns (m0..m11)
    val sigs = NearDup.signatures(docs, cfg.k)
    assert(sigs.columns.toSeq ==
      "doc_id" +: (0 until 12).map(j => s"m$j"))
    val cl = NearDup.clusters(docs, cfg)
      .as[(Long, Long)].collect().toMap
    assert(cl.keySet === Set(1L, 2L, 3L, 10L, 11L))
    assert(Set(1L, 2L, 3L).forall(cl(_) == 1L))
    assert(Set(10L, 11L).forall(cl(_) == 10L))
  }

  test("row-local MinHashSigs kernel is bit-identical to the " +
      "relational min-aggregate path on every doc and slot") {
    // graded corpus: repeated shingles, multi-space-free but varied
    // lengths; plus a doc with a DOUBLE space (empty word) to pin the
    // split(-1) parity and one with exactly 3 words (single shingle)
    val tricky = graded.union(Seq(
      900L -> "alpha  beta gamma delta", // empty word from double space
      901L -> "one two three"            // exactly one shingle
    ).toDF("doc_id", "text"))
    val rowLocal = NearDup.signatures(tricky)
    val relational = NearDup.signaturesFromHashes(
      NearDup.shingleHashes(tricky))
    assert(rowLocal.columns.toSeq === relational.columns.toSeq)
    val l = rowLocal.orderBy("doc_id").collect().map(_.toSeq)
    val r = relational.orderBy("doc_id").collect().map(_.toSeq)
    assert(l.toSeq === r.toSeq)
  }

  test("signatures plans ZERO shuffles — the row-local kernel needs " +
      "no explode and no aggregation") {
    val plan = NearDup.signatures(docs)
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, s"expected shuffle-free plan:\n$plan")
  }

  test("non-default config end-to-end: 2x8 precision banding still " +
      "recovers exact-copy clusters") {
    val cl = NearDup.clusters(docs, NearDup.LshConfig(2, 8, minSig = 16))
      .as[(Long, Long)].collect().toMap
    assert(cl.keySet === Set(1L, 2L, 3L, 10L, 11L))
    assert(Set(1L, 2L, 3L).forall(cl(_) == 1L))
    assert(Set(10L, 11L).forall(cl(_) == 10L))
  }
}
