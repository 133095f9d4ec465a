package graft

import org.apache.spark.sql.functions._

/** The one place the engine and its oracle deliberately compute
  * DIFFERENT things: x37/x44/x49 count distinct `xxhash64(shingle)`
  * (so only 8-byte hashes shuffle, never raw text) while the DuckDB
  * oracle counts distinct raw shingle strings (it has no xxhash64).
  * The two agree iff no 64-bit collision exists in the corpus's
  * shingle domain — overwhelmingly likely (birthday bound ~2³²
  * distinct shingles for a 50% collision), but previously only a
  * documented risk.
  *
  * This spec converts the risk into a CHECKED invariant: on the test
  * corpus, the distinct-raw and distinct-hashed counts must be equal
  * at every grain the queries aggregate on. A collision turns this
  * red with an exact explanation, instead of surfacing as an
  * unexplained oracle hash-mismatch three gates downstream.
  */
class HashCollisionAuditSpec extends SparkSpec {

  private val K = 8 // == x37's ContainK and x44/x49's DecontamK

  private def shingles = Tables.fanout(Tables.documents(spark, sf))
    .select(col("doc_id"), col("source"),
      split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= K)
    .select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(0), size(col("w")) - K),
        i => concat_ws(" ", slice(col("w"), i + 1, lit(K))))).as("g"))

  test("xxhash64 is collision-free on the corpus shingle domain") {
    val audit = shingles
      .agg(countDistinct(col("g")).as("raw"),
        countDistinct(xxhash64(col("g"))).as("hashed"))
      .head()
    assert(audit.getLong(0) == audit.getLong(1),
      s"xxhash64 collision in the corpus shingle domain: " +
        s"${audit.getLong(0)} raw vs ${audit.getLong(1)} hashed — " +
        "x37/x44/x49 counts now diverge from their oracles")
  }

  test("collision-free at the per-doc and per-source grains too") {
    // x37 aggregates per doc pair, x49 per source pair: a collision
    // WITHIN one doc's (or source's) shingle set shifts those counts
    // even if the global domain is clean.
    val perDoc = shingles
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("raw"),
        countDistinct(xxhash64(col("g"))).as("hashed"))
      .filter(col("raw") =!= col("hashed"))
    assert(perDoc.isEmpty, "per-doc shingle-set collision")
    val perSource = shingles
      .groupBy(col("source"))
      .agg(countDistinct(col("g")).as("raw"),
        countDistinct(xxhash64(col("g"))).as("hashed"))
      .filter(col("raw") =!= col("hashed"))
    assert(perSource.isEmpty, "per-source shingle-set collision")
  }
}
