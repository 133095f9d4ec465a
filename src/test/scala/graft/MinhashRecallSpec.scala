package graft

import org.apache.spark.sql.functions._

/** Recall floor for the MinHash+LSH candidate generator, the
  * counterpart of x51's precision/error audit. The planted pair
  * (doc, doc+1M — same text + a 3-word suffix) has J = s/(s+~4) for
  * s base shingles, so SHORT docs legitimately sit on the 4×4 band
  * curve's slope (s = 8 → J ≈ 0.73 → catch ≈ 0.74): an UNBIASED
  * family is expected to miss a couple of them, and does — exactly 2
  * of 50 at sf0.001, deterministically (fixed constants, fixed
  * corpus). The floor is 90%; the old correlated-multiplier family
  * "passed" at 100% only because its bias matched everything, which
  * is what x51's error bound now rules out — together the two specs
  * pin both sides of the estimator. */
class MinhashRecallSpec extends SparkSpec {
  import spark.implicits._

  test("planted near-duplicate recall stays above the band-curve floor") {
    val cand = SparkEntry.queries("x02_dedup_minhash_lsh")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      // the generator skips docs shorter than 3 words (no shingles)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id")).as[Long].collect()
      .map(d => (d, d + 1000000L))
    assert(planted.nonEmpty)
    val caught = planted.count(cand.contains)
    val recall = caught.toDouble / planted.length
    assert(recall >= 0.9,
      f"LSH recall $recall%.2f ($caught/${planted.length}) fell " +
        "below the 90% floor")
    // long docs (high J) must ALL be caught — the flat part of the
    // band curve, where a miss means a broken generator, not chance
    val longDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .filter(size(split(col("text"), " ")) >= 60)
      .select(col("doc_id")).as[Long].collect()
      .map(d => (d, d + 1000000L))
    val missedLong = longDocs.filterNot(cand.contains)
    assert(missedLong.isEmpty,
      s"LSH missed high-J pairs: ${missedLong.take(5).mkString(", ")}")
  }
}
