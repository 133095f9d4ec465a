package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deploy contract for the persisted IVF index (x79 build / x18 serve):
  * the index written to disk and read back must serve EXACTLY what the
  * inline oracle-gated path computes, and appends must be assignments-
  * only (frozen codebook) — the properties that make "build once, serve
  * forever, append daily" a safe operating mode at 100 TB.
  */
class AnnIndexSpec extends SparkSpec {

  private def e: DataFrame =
    AnnIndex.prep(Tables.embeddings(spark, sf)).cache()

  private def queries(src: DataFrame): DataFrame =
    src.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("norm").as("q_norm"))

  private def key(df: DataFrame): Set[(Long, Long, Long, Int, Double)] =
    df.select("q_id", "vec_id", "cluster", "rank", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSet

  test("write -> read -> serve is identical to the inline oracle-gated path") {
    val ev = e
    val cents = AnnIndex.train(ev)
    val assigned = AnnIndex.assign(ev, cents)
    val inline = key(AnnIndex.serve(queries(ev), cents, assigned))
    assert(inline.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("ann_index").toString
    AnnIndex.write(cents, assigned, dir)
    val (cb2, as2) = AnnIndex.read(spark, dir)
    // the persisted codebook is the trained one, bit-for-bit
    assert(cb2.count() == cents.count())
    val served = key(AnnIndex.serve(queries(ev), cb2, as2))
    assert(served == inline,
      s"persisted-index serve drifted: ${(inline -- served).take(3)}")
  }

  test("append is assignments-only: frozen codebook, existing rows stable") {
    val ev = e
    val cents = AnnIndex.train(ev).cache()
    val before = AnnIndex.assign(ev, cents)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // "new day of vectors": re-keyed copies with a deterministic
    // element-wise tweak so they are new points, not duplicates
    val appended = ev.select(
      (col("vec_id") + 10000000L).as("vec_id"),
      expr("transform(emb, x -> x * 0.9 + 0.01)").as("emb"))
      .withColumn("norm", sqrt(graft.functions.DotProduct(col("emb"),
        col("emb"))))
    val newAssign = AnnIndex.assign(appended, cents)
    assert(newAssign.count() == ev.count())
    // every appended vector got a cell from the FROZEN codebook
    val cells = cents.select("c_id").collect().map(_.getLong(0)).toSet
    assert(newAssign.select("cluster").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(cells))

    // incremental union: existing assignments must be BIT-STABLE —
    // re-assigning old vectors against the same frozen codebook can
    // never move them (determinism of argmin + id tie-break)
    val after = AnnIndex.assign(ev, cents)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before)

    // and serve over the unioned posting lists finds appended vectors
    val union = AnnIndex.assign(ev, cents).unionByName(newAssign)
    val served = AnnIndex.serve(queries(ev), cents, union)
    assert(served.filter(col("vec_id") >= 10000000L).count() > 0,
      "appended vectors never surfaced in served results")
  }
}
