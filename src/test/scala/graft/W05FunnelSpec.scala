package graft

import org.apache.spark.sql.Row

/** Structural invariants of w05's near-dup curation card — the
  * accounting identities that must hold for ANY corpus, checked on
  * top of the cell-exact DuckDB oracle (which pins the values):
  *
  *  - conservation: docs_in = docs_out + docs_removed;
  *  - every cluster has ≥ 2 members (a singleton can't arise from an
  *    edge relation), so docs_removed ≥ n_clusters ≥ 1 and each
  *    cluster contributes ≥ 1 edge: dup_pairs ≥ docs_removed;
  *  - the planted-dup floor: the generator plants one near-dup per
  *    10th doc and MinhashRecallSpec pins ≥ 90% LSH recall, so the
  *    funnel must remove at least ~¾ of the planted volume after the
  *    12/16 verify gate (the gate only DROPS pairs the band curve
  *    caught at lower agreement).
  */
class W05FunnelSpec extends SparkSpec {

  private lazy val card: Row =
    SparkEntry.queries("w05_neardup_funnel")(spark, sf).collect().head

  private def n(c: String): Long = card.getAs[Long](c)

  test("w05 card conserves documents across the funnel") {
    assert(n("docs_in") === n("docs_out") + n("docs_removed"))
  }

  test("w05 clusters are non-trivial and edge-backed") {
    assert(n("n_clusters") >= 1L)
    assert(n("docs_removed") >= n("n_clusters"))
    assert(n("dup_pairs") >= n("docs_removed"))
  }

  test("w05 removes most of the planted near-dup volume") {
    val planted = Tables.documents(spark, sf)
      .filter("doc_id % 10 = 0 AND size(split(text, ' ')) >= 3")
      .count()
    assert(planted > 0)
    assert(n("docs_removed").toDouble / planted.toDouble >= 0.75,
      s"removed ${n("docs_removed")} of $planted planted near-dups")
  }
}
