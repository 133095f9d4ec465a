package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable MinHash + LSH near-duplicate machinery — the library form
  * of the x02/x51/w05 query kernels (every consumer shares ONE
  * signature family, so estimates, error audits, and the funnel can
  * never drift apart).
  *
  * Input contract for every entry point: a DataFrame with columns
  * `doc_id` (numeric, unique) and `text` (string). Select/rename
  * before calling. Docs with fewer than 3 words have no word-3-gram
  * shingles and are treated as unique (they never cluster).
  *
  * Scale contract: signatures are computed ROW-LOCALLY by the native
  * [[graft.functions.MinHashSigs]] kernel (one fused
  * split→shingle→hash→min loop per doc inside whole-stage codegen —
  * no explode, no shuffle, no aggregation state; the relational
  * min-aggregate path remains as [[signaturesFromHashes]] for
  * consumers that share a shingle-hash relation); candidates come
  * from the 4-band LSH join (never all-pairs); clustering is
  * large-star/small-star
  * connected components (O(log n) rounds at any graph diameter);
  * [[dedupe]]'s survivor window runs over CLUSTERED docs only, so its
  * cost is bounded by duplicate volume, not corpus size. Shingle text
  * never shuffles — only 64-bit hashes do.
  *
  * Tuning: the [[LshConfig]] default (4 bands × 4 rows of the k = 16
  * family) puts the s-curve's knee near J ≈ 0.6; the default
  * [[DefaultMinSig]] = 12/16 verify gate keeps pairs with estimated
  * J ≥ 0.75. For a stricter corpus pass, raise `minSig`; for
  * recall-first candidate mining, use a flatter banding (more bands,
  * fewer rows — e.g. 8×2, knee ≈ 0.35) or read [[sigPairs]] directly.
  */
object NearDup {

  /** LSH banding configuration: `bands` bands of `rows` signature
    * slots each (k = bands·rows ≤ 16 — the size of the fixed
    * permutation family [[A]]/[[B]]), and the signature-agreement
    * verify gate `minSig` (of k).
    *
    * The s-curve: P(candidate | Jaccard J) = 1 − (1 − J^rows)^bands,
    * with knee (P = 1 − 1/e ≈ 0.63) at J ≈ (1/bands)^(1/rows):
    *  - 8×2  → knee ≈ 0.35 (recall-first: flat, catches low-J pairs)
    *  - 4×4  → knee ≈ 0.71 (the default: near-dup territory)
    *  - 2×8  → knee ≈ 0.92 (precision-first: near-exact copies only)
    * Because all bandings slice the SAME signature family, a match on
    * an r-row band implies a match on its r'-row sub-bands — so for
    * rows' | rows the candidate set of the finer banding contains the
    * coarser's (NearDupSpec pins 4×4 ⊆ 8×2). */
  final case class LshConfig(bands: Int, rows: Int, minSig: Int) {
    val k: Int = bands * rows
    require(bands >= 1 && rows >= 1 && k <= 16,
      s"bands*rows must be in 1..16, got $bands x $rows")
    require(minSig >= 0 && minSig <= k,
      s"minSig must be in 0..$k, got $minSig")
    /** Jaccard at the s-curve knee, (1/bands)^(1/rows). */
    def knee: Double = math.pow(1.0 / bands, 1.0 / rows)
  }

  /** 4 bands × 4 rows, verify at 12/16 — the x02/x51/w05 family. */
  val DefaultConfig: LshConfig = LshConfig(4, 4, minSig = 12)

  /** MinHash permutation constants (k=16, 4 bands × 4 rows).
    * Multipliers must be LARGE: with a small `a`, `a·h + b mod P` is
    * order-preserving over most of the hash range, so every slot's
    * min collapses to the same argmin(h) and the 16 "independent"
    * permutations correlate almost perfectly — x51's error audit
    * caught exactly that (est ≈ 0.94 on near-disjoint sets) when
    * these were the first 16 odd primes. Fixed large constants
    * < P = 2³¹−1 keep a·h < 2⁶² (no Long/BIGINT overflow in either
    * engine). */
  val A: Seq[Long] = Seq(1103515245L, 1931083987L, 1203114875L,
    1674265165L, 940312177L, 1569812341L, 2071453219L, 1215312861L,
    1725127429L, 847612513L, 1411933441L, 1990744129L, 652821843L,
    1352689153L, 2033321477L, 762934511L)
  val B: Seq[Long] = Seq(1013904223L, 192093119L, 1727018333L,
    414349043L, 881231617L, 1579231013L, 245113957L, 1902711133L,
    663253381L, 1120481167L, 1811281861L, 537817247L, 1341595123L,
    978312007L, 2040911437L, 301415261L)
  val P: Long = 2147483647L

  /** Signature-agreement threshold for a VERIFIED near-dup edge:
    * ≥ 12 of 16 slots ⇒ estimated Jaccard ≥ 0.75. */
  val DefaultMinSig = 12

  /** Spark SQL: distinct word-3-gram shingles of `text` (0-based
    * idx). The ≥ 3-words gate guarding it is load-bearing: sequence's
    * step defaults to −1 when start > stop, so a 1-word doc would
    * yield negative indices, not an empty list. */
  val shingleSql: String =
    """array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
      |  i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1],
      |       split(text, ' ')[i+2])))""".stripMargin.replace("\n", " ")

  /** (doc_id, h): one row per distinct word-3-gram shingle, hashed by
    * the native codegen'd polynomial fold (graft.functions.PolyHash —
    * the oracle-portable 31-base mod-1e9+7 hash). */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(expr(shingleSql)).as("shingle"))
      .withColumn("h", graft.functions.PolyHash(col("shingle")))
      .select("doc_id", "h")

  /** k MinHash signatures (columns m0..m(k−1)) from a (doc_id, h)
    * shingle-hash relation: k min-aggregates in ONE codegen'd
    * HashAggregate — a single map-side-combined pass, no permutation
    * join, no array state. */
  def signaturesFromHashes(sh: DataFrame,
      k: Int = DefaultConfig.k): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in 1..16, got $k")
    val minCols = (0 until k).map { j =>
      min((lit(A(j)) * col("h") + lit(B(j))) % P).as(s"m$j")
    }
    sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
  }

  /** k MinHash signatures straight from the corpus — the row-local
    * native kernel ([[graft.functions.MinHashSigs]]): one fused
    * split→shingle→hash→min loop per document inside whole-stage
    * codegen, ZERO shuffles (the relational path's exploded
    * (doc_id, h) relation and its groupBy never exist). Values are
    * bit-identical to [[signaturesFromHashes]] ∘ [[shingleHashes]]
    * (min over the shingle multiset = min over the distinct set;
    * NearDupSpec pins the equivalence), so consumers' oracles are
    * unchanged. Use [[signaturesFromHashes]] only when a shared
    * (doc_id, h) relation is needed anyway (x51's exact-Jaccard
    * audit reuses one shingle-hash pass for both sides). */
  def signatures(docs: DataFrame,
      k: Int = DefaultConfig.k): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in 1..16, got $k")
    docs.filter(size(split(col("text"), " ")) >= 3)
      .withColumn("_mh", graft.functions.MinHashSigs(col("text")))
      .select(col("doc_id") +:
        (0 until k).map(j => col("_mh").getItem(j).as(s"m$j")): _*)
  }

  /** Banded LSH candidate pairs (doc_a < doc_b, distinct) from
    * [[signaturesFromHashes]] output — the banded join that replaces
    * the O(n²) all-pairs scan. `cfg` picks the banding; the input
    * must carry at least `cfg.k` signature columns. */
  def candidates(sigs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame = {
    val bandKeys = array((0 until cfg.bands).map { b =>
      concat_ws("_", (0 until cfg.rows).map(r =>
        col(s"m${cfg.rows * b + r}").cast("string")): _*)
    }: _*)
    val bands = sigs.select(col("doc_id"),
      posexplode(bandKeys).as(Seq("band", "band_key")))
    bands.select(col("doc_id").as("doc_a"),
        col("band"), col("band_key"))
      .join(bands.select(col("doc_id").as("doc_b"),
        col("band"), col("band_key")), Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Attach signature-agreement counts to a (doc_a, doc_b) candidate
    * relation using an ALREADY-COMPUTED signature relation — the
    * verify stage, factored out so multi-banding consumers (x56)
    * reuse one signature pass instead of re-shingling per banding. */
  def agreementOf(sigs: DataFrame, cand: DataFrame,
      k: Int = DefaultConfig.k): DataFrame = {
    val sigA = sigs.select(col("doc_id").as("doc_a") +:
      (0 until k).map(j => col(s"m$j").as(s"a$j")): _*)
    val sigB = sigs.select(col("doc_id").as("doc_b") +:
      (0 until k).map(j => col(s"m$j").as(s"b$j")): _*)
    cand.join(sigA, Seq("doc_a")).join(sigB, Seq("doc_b"))
      .withColumn("sig_matches",
        (0 until k).map(j =>
          when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
          .reduce(_ + _))
      .select("doc_a", "doc_b", "sig_matches")
  }

  /** Every LSH candidate pair with its signature-agreement count
    * (doc_a, doc_b, sig_matches ∈ 0..k; estimated Jaccard =
    * sig_matches / k). */
  def sigPairs(docs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame = {
    val sigs = signatures(docs, cfg.k)
    agreementOf(sigs, candidates(sigs, cfg), cfg.k)
  }

  /** Verified near-dup edge relation: candidates whose signature
    * agreement clears `cfg.minSig` of `cfg.k`. */
  def edges(docs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame =
    sigPairs(docs, cfg).filter(col("sig_matches") >= cfg.minSig)
      .select("doc_a", "doc_b")

  /** (doc_id, cluster_id) for every doc in a near-dup cluster
    * (cluster_id = the cluster's minimum doc_id). Docs with no
    * verified near-dup don't appear. */
  def clusters(docs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame =
    ConnectedComponents.run(Checkpoints.cut(edges(docs, cfg)))
      .select(col("id").as("doc_id"), col("cluster_id"))

  /** The corpus with near-duplicates removed: every input row except
    * cluster members other than their cluster's min-doc_id survivor.
    * Preserves all input columns. */
  def dedupe(docs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame = {
    val removed = clusters(docs, cfg)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(removed, Seq("doc_id"), "left_anti")
  }

  // -------------------------------------------------------------------
  // Persisted index + incremental dedup — the build/serve split for
  // the MinHash family (AnnIndex's contract, lexical edition): a
  // 100 TB corpus signs ONCE, persists the signature table, and each
  // day's shard is deduped against the index by signing ONLY the
  // delta. The stored form is just [[signatures]] output — band keys
  // are a row-local projection of the signature columns, so there is
  // nothing else to store and the banding stays reconfigurable at
  // read time.
  // -------------------------------------------------------------------

  /** Persist a corpus's signature index (one row per ≥3-word doc:
    * doc_id, m0..m15). */
  def writeIndex(docs: DataFrame, dir: String,
      k: Int = DefaultConfig.k): Unit =
    graft.sources.Sources.writeOrdered(
      Seq("minhash_index" -> signatures(docs, k)), dir)

  /** Load a persisted signature index. */
  def readIndex(s: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = SegmentOps.readKnown(s, s"$dir/minhash_index")

  /** Remove documents from a signature index — EXACT by construction:
    * signatures are per-doc and row-local, so the anti-join equals
    * re-signing the corpus without the docs (x96's family symmetry;
    * the sparse family's [[graft.etl.SparseIndex.delete]] is where the
    * un-truncation work lives — here there is nothing shared between
    * docs to repair). A REVISION is delete + re-sign the revised doc
    * into the index ([[incrementalEdges]]'s disjointness precondition
    * is restored by the delete). Deleting an absent id is a no-op. */
  def deleteFromIndex(sigs: DataFrame, docIds: DataFrame): DataFrame =
    sigs.join(docIds.select("doc_id").distinct(), Seq("doc_id"),
      "left_anti")

  /** Verified near-dup edges of DELTA docs against base ∪ delta:
    * (doc_id ∈ delta, dup_of) where dup_of is a base doc or an
    * earlier (smaller-id) delta doc. Only delta rows are signed by
    * the caller; the base side comes from a signature index — the
    * whole base corpus is touched ONLY through its (already-computed)
    * signatures, never re-shingled. Cost: the banded join of delta's
    * band keys against the combined band relation + the agreement
    * verify — bounded by delta size × bucket occupancy, never by the
    * base corpus.
    *
    * Precondition: base and delta doc_id sets are DISJOINT (the same
    * ingest contract as `SparseIndex.append` — a doc revision is
    * delete + re-append upstream). A doc_id on both sides would carry
    * duplicate signature rows through the union, double-joining in
    * agreementOf and mis-orienting its edges; the sf-sized inputs here
    * make an eager check cheap relative to the band join, so it is
    * asserted rather than assumed. */
  def incrementalEdges(baseSigs: DataFrame, deltaSigs: DataFrame,
      cfg: LshConfig = DefaultConfig): DataFrame = {
    val clash = baseSigs.select("doc_id")
      .join(deltaSigs.select("doc_id"), "doc_id").limit(1).count()
    require(clash == 0L,
      "NearDup.incrementalEdges: delta doc_ids overlap the base index " +
        "— incremental dedup is defined for disjoint shards " +
        "(revise = delete + append)")
    def bands(sigs: DataFrame): DataFrame = {
      val bandKeys = array((0 until cfg.bands).map { b =>
        concat_ws("_", (0 until cfg.rows).map(r =>
          col(s"m${cfg.rows * b + r}").cast("string")): _*)
      }: _*)
      sigs.select(col("doc_id"), posexplode(bandKeys)
        .as(Seq("band", "band_key")))
    }
    val allSigs = baseSigs.unionByName(deltaSigs)
    val cand = bands(deltaSigs)
      .select(col("doc_id").as("doc_id"), col("band"), col("band_key"))
      .join(bands(allSigs)
        .select(col("doc_id").as("dup_of"), col("band"),
          col("band_key")), Seq("band", "band_key"))
      .filter(col("dup_of") =!= col("doc_id"))
      .select("doc_id", "dup_of").distinct()
    // keep only (delta, base) and (delta, earlier-delta) orientations
    val baseIds = baseSigs.select(col("doc_id").as("dup_of"))
    val orientated = cand.join(baseIds, Seq("dup_of"), "left_semi")
      .unionByName(
        cand.join(baseIds, Seq("dup_of"), "left_anti")
          .filter(col("dup_of") < col("doc_id")))
    agreementOf(allSigs,
      orientated.select(col("dup_of").as("doc_a"),
        col("doc_id").as("doc_b")), cfg.k)
      .filter(col("sig_matches") >= cfg.minSig)
      .select(col("doc_b").as("doc_id"), col("doc_a").as("dup_of"))
  }
}
