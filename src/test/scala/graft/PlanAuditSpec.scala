package graft

/** The 100 TB plan audit as a permanent regression test: no query may
  * plan a CartesianProduct or BroadcastNestedLoopJoin unless its
  * pair-producing side is bounded BY CONSTRUCTION and documented here.
  * A new query that accidentally introduces an unkeyed join (the
  * classic silent scale-killer — fine at sf0.001, quadratic at sf1)
  * fails this spec instead of a future bench run.
  */
class PlanAuditSpec extends SparkSpec {

  // query → why its nested-loop/cartesian side cannot grow with data
  private val allow: Map[String, String] = Map(
    "x80_bm25" -> ("1-row corpus-stats scalar (n_docs, t_tokens) " +
      "broadcast into the scoring projection — never grows"),
    "x88_sparse_index_build" -> ("the same 1-row corpus-stats scalar " +
      "broadcast onto the per-term build card — never grows"),
    "x92_sparse_index_append" -> ("x88's census card over the appended " +
      "index — the same 1-row corpus-stats scalar, never grows"),
    "x96_index_delete" -> ("x88's census card over the deleted " +
      "index — the same 1-row corpus-stats scalar, never grows"),
    "x98_delete_serve" -> ("x80's serve over the deleted index — the " +
      "same 1-row corpus-stats scalar broadcast into the scoring " +
      "projection, never grows"),
    "x99_segmented_serve" -> ("x80's serve over the segmented live " +
      "view — the same 1-row corpus-stats scalar (here the summed " +
      "base+segment deltas card) broadcast into the scoring " +
      "projection, never grows"),
    "w09_segment_lifecycle" -> ("x80's serve over the lifecycle's " +
      "materialized layout — the same 1-row corpus-stats scalar " +
      "broadcast into the scoring projection, never grows"),
    "w10_pq_lifecycle" -> ("PqIndex.serve over the pq lifecycle's " +
      "materialized layout — the fixed 16-row coarse codebook and " +
      "8-row PQ books broadcast for probing/LUTs, never grow; the " +
      "query side is the absolute-K slice"),
    "x104_pq_refine" -> ("x97's serve plus the refine tail: the " +
      "fixed codebooks broadcast; the truth slice and per-config " +
      "rows_refined / n_scanned_total 1-row censuses cross-join into " +
      "3 summary rows — the truth cartesian's query side is the " +
      "absolute-K slice (<= EvalK rows by construction)"),
    "q56_funnel_conversion" -> ("three 1-row step-summary scalars " +
      "cross-joined into the single output row — never grows"),
    "q57_t_closeness" -> ("1-row corpus-total scalar + the constant " +
      "11-band grid broadcast under each class — never grows"),
    "x85_quantile_calibration" -> ("constant 9-row decile grid " +
      "broadcast under histogram-sized relations — never grows"),
    "x86_hubness" -> ("composes x05's documented brute-force truth " +
      "slice verbatim plus a 1-row occupancy-stats scalar — " +
      "candidate-list-sized, never grows"),
    "x87_centroid_drift" -> ("x18's fixed 16-row codebook broadcasts " +
      "for the Lloyd/assignment argmins plus a 1-row totals scalar — " +
      "never grows"),
    "x83_maxsim_rerank" -> ("composes x05b verbatim — inherits its " +
      "allowlisted bounded plane-index relation; the rerank itself " +
      "is keyed joins only"),
    "w07_rag_funnel" -> ("composes x80 (1-row corpus-stats scalar) " +
      "and x05b (bounded plane index) verbatim — inherits exactly " +
      "their allowlisted bounded sides; fusion/rerank/packing are " +
      "keyed joins and windows only"),
    "x93b_funnel_sweep" -> ("composes x80/x05b/x05's documented " +
      "bounded arms; the 1-row cost censuses (n_dense_pairs, " +
      "n_rerank_rows) cross-join into 1-row config summaries — " +
      "never grow; the flips fan-out is the constant plane count"),
    "x93_funnel_recall" -> ("composes w07 and x05's documented " +
      "brute-force truth slice verbatim — inherits exactly their " +
      "allowlisted bounded sides; the eval itself is keyed joins " +
      "over <= 10-rows/query relations"),
    "w07b_rag_funnel_pq" -> ("composes x80 (1-row corpus-stats " +
      "scalar) and PqIndex.serveRefined (fixed 16-row coarse + 8-row " +
      "PQ codebooks broadcast; the refine side is <= RefineK rows " +
      "per query by construction, the query side the absolute-K " +
      "slice) — fusion/rerank/packing are keyed joins and windows " +
      "only"),
    "x93c_funnel_pq_recall" -> ("composes w07b and x05's documented " +
      "brute-force truth slice verbatim — inherits exactly their " +
      "allowlisted bounded sides (x93's pattern)"),
    "w12_online_funnel" -> ("composes the lifecycle serves: x80's " +
      "1-row corpus-stats scalar over the sparse layout, the fixed " +
      "16-row coarse + 8-row PQ codebooks broadcast over the pq " +
      "layout (query side = the absolute-K slice); fusion " +
      "(full-outer keyed), rerank and packing are keyed joins and " +
      "windows only"),
    "w08_nightly_ingest" -> ("x18's fixed 16-row coarse codebook and " +
      "the 8-row PQ books broadcast (train/assign/encode argmins) " +
      "plus the 1-row family-card scalars (append + retraction " +
      "censuses) cross-joined into the 19-row report — never grows"),
    "x95_pq_adc_serve" -> ("x58's fixed 8-row PQ codebooks broadcast " +
      "for training (never grow); the |q|x8 ADC lookup tables and " +
      "the truth slice are UNHINTED — the query side grows with the " +
      "corpus (x05's rule), so AQE decides; the cartesian is x05's " +
      "documented brute-force truth slice, joined unkeyed on purpose"),
    "x97_ivfpq_serve" -> ("x18's fixed 16-row coarse codebook and " +
      "x58's fixed 8-row PQ codebooks broadcast for training/probing " +
      "(never grow); LUTs and the truth slice are UNHINTED (query " +
      "side grows with the corpus — x05's rule); the cartesian is " +
      "x05's documented brute-force truth slice, joined unkeyed on " +
      "purpose"),
    "x103_adaptive_probes" -> ("x97's serve tail behind the adaptive " +
      "probe relation — the same fixed 16-row coarse codebook and " +
      "8-row PQ books broadcast, the same unhinted LUTs/truth slice, " +
      "the same documented brute-force truth cartesian"),
    "x106_simhash_contract" -> ("the exact-Hamming truth leg is a " +
      "deliberate cross-join over the mod-sampled slice — absolutely " +
      "bounded by the modulus (x05's documented bounded-slice " +
      "pattern); the banded legs and the miss audit are keyed joins"),
    "x05_knn_cosine" -> ("documented brute-force recall baseline: the " +
      "query slice is joined unkeyed against the corpus on purpose"),
    "x05_knn_lsh" -> ("plane-index relation: ≤ floor(log2 n)+2 rows " +
      "(~42 at any realistic n)"),
    "x46_label_noise" -> ("x05's documented brute-force probe slice " +
      "(1% of vectors) reused for the label-agreement audit; LSH/IVF " +
      "are the drop-in scale variants"),
    "x10_dedup_embedding" ->
      "same bounded plane-index relation as x05_knn_lsh",
    "x18_knn_ivf" -> "fixed 16-row coarse codebook",
    "x79_ann_index_build" -> ("x18's build phase alone — the same " +
      "fixed 16-row codebook broadcasts for Lloyd/assignment argmins"),
    "x47_kmeans_step" -> "fixed 8-row seed codebook (x18's pattern)",
    "x50_group_split" -> ("splits crossJoin a SINGLE-ROW straddle " +
      "aggregate (2×1 by construction, a17's pattern)"),
    "x33_semdedup" -> ("same fixed 16-row coarse codebook as " +
      "x18_knn_ivf, plus the bounded plane-index relation"),
    "q14_run_summary" -> "scalar subqueries (1-row relations)",
    "q30_skew_profile" -> ("top-10 keys crossJoin a SINGLE-ROW totals " +
      "aggregate (10×1 by construction)"),
    "a17_histogram" -> ("rows crossJoin a SINGLE-ROW min/max " +
      "aggregate (n×1 broadcast scalar)"),
    "j07_interval_agg" -> ("1-row first-day scalar joined to the " +
      "bounded day grain"),
    "x21_tombstone_cascade" -> ("audit rows assemble via crossJoin of " +
      "two SINGLE-ROW count aggregates per table (1×1 by construction); " +
      "the cascade itself is keyed anti/semi joins"),
    "q33_distribution_drift" -> ("rows crossJoin a SINGLE-ROW min/max " +
      "day-bounds aggregate (n×1 broadcast scalar, a17's pattern)"),
    "x36_weighted_sample" -> ("rows crossJoin a SINGLE-ROW total-weight " +
      "aggregate (n×1 broadcast scalar, a17's pattern)"),
    "q42_basket_affinity" -> ("pairs crossJoin a SINGLE-ROW order-count " +
      "aggregate (n×1 broadcast scalar, a17's pattern)"),
    "x49_source_overlap" -> ("full pair-domain self-join of the sizes " +
      "relation — bounded by the SOURCE domain (a handful of rows), " +
      "not the data; makes zero-overlap pairs explicit n_shared=0 rows"),
    "w05_neardup_funnel" -> ("card crossJoin a SINGLE-ROW dup-pairs " +
      "count aggregate (1×1 by construction, q14's scalar pattern)"),
    "x52_zorder_layout" -> ("rows crossJoin a SINGLE-ROW min/max " +
      "aggregate (n×1 broadcast scalar, a17's pattern)"),
    "x55_semantic_decontam" -> ("same bounded plane-index relation as " +
      "x05_knn_lsh/x10: signBucketsCapped broadcasts ≤62 plane rows " +
      "(DedupSim.scala signBucketsCapped); candidates come only from " +
      "bucket-equality hash joins"),
    "x58_pq_codes" -> ("fixed 8-row per-subspace codebooks broadcast " +
      "for the Lloyd/code argmins (x18/x47's pattern) — never grows " +
      "with data"),
    "x60_ann_recall" -> ("composes x05 (documented brute-force " +
      "baseline), x05b (bounded plane index) and x18 (≤16-row " +
      "codebook) verbatim — inherits exactly their allowlisted " +
      "bounded nested-loop sides"),
    "x61_bpe_merge" -> ("symbols crossJoin the SINGLE-ROW argmax " +
      "merge pair (n×1 broadcast scalar, a17's pattern)"),
    "w06_dedup_cascade" -> ("stage 3 reuses signBucketsCapped's " +
      "bounded plane-index crossJoin (≤62 broadcast rows, " +
      "x05_knn_lsh's pattern)"),
    "x62_hard_negatives" -> ("x05/x46's documented brute-force probe " +
      "slice (1% of vectors) for the margin audit; LSH/IVF are the " +
      "drop-in scale variants"),
    "x63_diverse_sample" -> ("fixed 8-row codebook broadcast for the " +
      "assignment argmin (x47's pattern)"),
    "x68_annotator_agreement" -> ("final kappa combine crossJoins two " +
      "SINGLE-ROW aggregates over the ≤|langs|² confusion matrix " +
      "(1×1 by construction, q14's scalar pattern)"),
    "x76_license_gate" -> ("4-row class rollup crossJoins its " +
      "SINGLE-ROW token total (4×1 by construction, a17's scalar " +
      "pattern); the license registry joins keyed + broadcast"),
    "m07_modality_mix" -> ("3-row modality rollup crossJoins its " +
      "SINGLE-ROW grand total (3×1 by construction, a17's scalar " +
      "pattern)"),
    "x75_context_budget" -> ("composes x05b verbatim — inherits its " +
      "allowlisted bounded plane-index relation; the token join and " +
      "budget window are keyed"),
    "x73_rrf_fusion" -> ("composes x05 (documented brute-force " +
      "baseline) and x05b (bounded plane index) verbatim — inherits " +
      "exactly their allowlisted bounded nested-loop sides (x60's " +
      "pattern); the fusion join itself is keyed on (q_id, vec_id)"),
    "x72_cms_frequency" -> ("audited tokens crossJoin the SINGLE-ROW " +
      "total-count aggregate (100×1 by construction, a17's scalar " +
      "pattern); the counter matrix itself joins keyed on (r, bucket)"),
    "x71_kmv_overlap" -> ("x49's pattern: the src_a < src_b pair " +
      "domain is a self-join of the per-SOURCE sizes/sketch relations " +
      "— bounded by the source domain (a handful of rows carrying " +
      "128-long sketches), never by the data"))

  test("no unbounded cartesian/nested-loop join in any query plan") {
    val offenders = SparkEntry.defs.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      if (bad.nonEmpty && !allow.contains(q.name)) Some(s"${q.name}: $bad")
      else None
    }
    assert(offenders.isEmpty,
      "unkeyed joins outside the allowlist:\n" + offenders.mkString("\n"))
  }
}
