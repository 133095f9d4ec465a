package graft

import org.apache.spark.sql.Row

/** The property x54 exists to demonstrate: adding a 17th shard moves
  * ~1/17 of a rendezvous-hashed corpus but ~16/17 of a mod-hashed
  * one. The oracle pins the exact counts; this pins the inequality
  * and the theory proximity, so a biased score family (the first cut
  * moved 3.7% on a 3×-imbalanced assignment — see hrwScore's
  * scaladoc) fails here instead of shipping. */
class ShardRebalanceSpec extends SparkSpec {

  private lazy val card: Row =
    SparkEntry.queries("x54_shard_rebalance")(spark, sf).collect().head

  test("rendezvous moves an order of magnitude less than mod") {
    val fm = card.getAs[Double]("frac_mod")
    val fh = card.getAs[Double]("frac_hrw")
    assert(fh * 5 < fm, s"hrw $fh not well under mod $fm")
    // mod rewrites almost everything: 16/17 ≈ 0.941
    assert(fm > 0.85 && fm < 1.0, s"frac_mod $fm")
    // hrw moves only what the new shard wins: 1/17 ≈ 0.059
    assert(fh > 0.01 && fh < 0.12, s"frac_hrw $fh")
  }
}
