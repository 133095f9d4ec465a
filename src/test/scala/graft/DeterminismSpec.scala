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

  // ---------------------------------------------------------------
  // Determinism UNDER LOAD — the gate class the per-registration
  // pipeline was missing (VERDICT r12 #1/#7): every other gate runs a
  // query ONCE, so a low-frequency nondeterminism (the r12 driver-row
  // x105 hash flake) slips through. The layout-measuring queries —
  // the ones that build on-disk lifecycles on driver-side thread
  // pools and measure cells back off the disk — are re-run N times
  // WHILE a background thread keeps the session busy with unrelated
  // queries (the driver's 8-way Verify concurrency in miniature), and
  // every repetition must be bit-identical.
  // ---------------------------------------------------------------
  private val layoutMeasuring = Seq(
    "x105_compaction_policy",  // 3-config pool over a shared cut input
    "x107_tiered_compaction",  // same pool shape, tiered merges
    "x108_leveled_compaction", // same pool shape, leveled schedule
    "x109_geometric_schedule", // same pool shape, geometric cascade
    "x110_snapshot_cdc",       // same pool shape, CDC window diff
    "w13_cdc_dedup_sync",      // CDC-driven incremental edge table
    "w12_online_funnel",       // par() pairs over three shared cut inputs
    "w08_nightly_ingest",      // four families' append/retraction cards
    "w09_segment_lifecycle",   // sparse nightly: measured from disk
    "w10_pq_lifecycle",        // dense nightly: measured from disk
    "w11_minhash_lifecycle")   // minhash nightly: measured from disk

  test("layout-measuring queries are bit-identical across repeated " +
      "runs under concurrent query load") {
    val reps = 3
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // ambient load: an unrelated mix cycling on a background thread
    val noise = Seq("a01_daily_user_rollup", "q09_topk_time_window",
      "x01_dedup_exact")
    val loader = new Thread(() => {
      var i = 0
      while (!stop.get()) {
        SparkEntry.queries(noise(i % noise.size))(spark, sf).collect()
        i += 1
      }
    })
    loader.setDaemon(true)
    loader.start()
    try layoutMeasuring.foreach { name =>
      val runs = (1 to reps).map(_ =>
        SparkEntry.queries(name)(spark, sf).collect().toSeq
          .map(_.toSeq))
      runs.sliding(2).foreach { case Seq(a, b) =>
        assert(a == b,
          s"$name drifted between repetitions under load — " +
            "the determinism-under-load gate is red")
      }
    } finally {
      stop.set(true)
      loader.join(30000)
    }
  }
}
