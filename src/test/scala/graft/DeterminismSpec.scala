package graft

/** The engine's reproducibility contract, as a regression test: every
  * floating-point-producing query must return BIT-IDENTICAL results at
  * different parallelism. This is what the exact-decimal accumulation
  * discipline (Num.dsum, the q35 moment rules) buys — a plain double
  * SUM would differ in the last ulp between 3 and 11 shuffle
  * partitions, and a result that depends on cluster size is not a
  * result. Representative set: one per accumulation pattern (decimal
  * agg, window frame, exact moments, decimal TWA, in-row fold,
  * percentile, rate division).
  */
class DeterminismSpec extends SparkSpec {

  private val floatQueries = Seq(
    "st01_event_windows",     // dsum decimal aggregation
    "a08_moving_window",      // decimal window frame sums
    "q35_correlation",        // exact moments → IEEE assembly
    "a20_time_weighted_avg",  // decimal value×interval accumulation
    "x39_centroid_profile",   // in-row fold + decimal re-entry
    "q15_percentiles",        // histogram-path interpolated percentiles
    "q29_mad_outliers",       // two-level histogram medians + MAD
    "a31_winsorized",         // clip bounds + pinned-order mean assembly
    "q45_ks_test",            // integer rank cross-products → one division
    "q46_rank_sum",           // doubled-rank midranks → two divisions
    "q47_bootstrap_ci",       // hash-weighted replicate means + CI pick
    "x47_kmeans_step",        // min_by assignment + decimal codebook means
    "q33_distribution_drift") // exact-count rate divisions

  test("float-producing queries are bit-identical at 3 vs 11 " +
      "shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    def runAll(parts: String): Map[String, Seq[Seq[Any]]] = {
      spark.conf.set(key, parts)
      floatQueries.map { name =>
        name -> SparkEntry.queries(name)(spark, sf).collect()
          .toSeq.map(_.toSeq)
      }.toMap
    }
    try {
      val at3 = runAll("3")
      val at11 = runAll("11")
      floatQueries.foreach { name =>
        assert(at3(name) == at11(name),
          s"$name differs across parallelism")
      }
    } finally spark.conf.set(key, old)
  }
}
