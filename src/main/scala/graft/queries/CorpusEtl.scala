package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.Checkpoints.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W03 — the LLM-corpus counterpart of w02's warehouse build: the whole
  * standard pre-training cleanup funnel as ONE declarative plan, with a
  * per-source audit row as the result (the numbers a dataset card
  * reports for each stage).
  *
  * Stages, composed from this engine's first-class operators:
  *   1. canonicalize (t18): collapse whitespace, trim, lowercase —
  *      row-local codegen, zero shuffle;
  *   2. exact dedup (x01): survivor = min doc_id per md5(canonical) —
  *      one hash-keyed shuffle;
  *   3. quality gate (x12 family): token count in [5, 1000] and mean
  *      word length < 15 — row-local, exact-division compare;
  *   4. audit: per-source survivor counts per stage + surviving tokens.
  *
  * Scale shape: one shuffle for the dedup window (keyed on the 128-bit
  * fingerprint), one partial-agg shuffle for the audit — the funnel
  * itself never materializes intermediate corpora. At 100 TB the same
  * plan runs stage-fused in whole-stage codegen with the dedup exchange
  * as the only data-sized movement.
  */
object CorpusEtl {

  private def w03(s: SparkSession, d: String): DataFrame = {
    val canon = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("canon"))
      .withColumn("fp", md5(col("canon")))
      .withColumn("n_tok", size(split(col("canon"), " ")).cast("long"))
    val wFp = Window.partitionBy(col("fp"))
    val staged = canon
      .withColumn("dedup_keep",
        col("doc_id") === min(col("doc_id")).over(wFp))
      // mean word length over the canonical form: exactly one single
      // space between tokens, so chars-in-words = len - (n_tok - 1);
      // the comparison is one exactly-rounded division — engine-exact
      .withColumn("quality_keep",
        col("n_tok") >= 5L && col("n_tok") <= 1000L &&
          (length(col("canon")).cast("double") -
            (col("n_tok") - 1L).cast("double")) /
            col("n_tok").cast("double") < 15.0)
    staged.groupBy(col("source"))
      .agg(count(lit(1)).as("docs_in"),
        sum(when(col("dedup_keep"), 1L).otherwise(0L))
          .as("docs_after_dedup"),
        sum(when(col("dedup_keep") && col("quality_keep"), 1L)
          .otherwise(0L)).as("docs_out"),
        sum(when(col("dedup_keep") && col("quality_keep"), col("n_tok"))
          .otherwise(0L)).as("tokens_out"))
      .orderBy("source")
  }
  private val w03Sql =
    """WITH canon AS (
      |  SELECT doc_id, source,
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS canon
      |  FROM documents),
      |staged AS (
      |  SELECT doc_id, source, canon,
      |    CAST(len(string_split(canon, ' ')) AS BIGINT) AS n_tok,
      |    doc_id = MIN(doc_id) OVER (PARTITION BY md5(canon))
      |      AS dedup_keep
      |  FROM canon),
      |gated AS (
      |  SELECT source, n_tok, dedup_keep,
      |    (n_tok >= 5 AND n_tok <= 1000 AND
      |      (CAST(length(canon) AS DOUBLE)
      |        - CAST(n_tok - 1 AS DOUBLE))
      |        / CAST(n_tok AS DOUBLE) < 15.0) AS quality_keep
      |  FROM staged)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in,
      |  CAST(SUM(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_after_dedup,
      |  CAST(SUM(CASE WHEN dedup_keep AND quality_keep THEN 1 ELSE 0
      |    END) AS BIGINT) AS docs_out,
      |  CAST(SUM(CASE WHEN dedup_keep AND quality_keep THEN n_tok
      |    ELSE 0 END) AS BIGINT) AS tokens_out
      |FROM gated GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // W04 — the full modern pre-training CURATION funnel as one plan,
  // reporting the dataset-card numbers per stage: raw → language
  // filter → quality gate → exact dedup (among survivors) → benchmark
  // decontamination (x44's n-gram screen; eval docs themselves leave
  // the corpus here too). Every stage is a cumulative flag computed in
  // one pass — the funnel never materializes intermediate corpora —
  // plus one fingerprint-keyed window for dedup and one hash-keyed
  // semi-join for contamination. Same one-sided xxhash64 fingerprint
  // caveat as x37/x44 (documented there).
  // ---------------------------------------------------------------------
  private val CurK = 8

  private def w04(s: SparkSession, d: String): DataFrame = {
    val k = CurK
    val sh = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - k),
          i => xxhash64(concat_ws(" ",
            slice(col("w"), i + 1, lit(k)))))).as("h"))
      .distinct()
    val evalSh = sh.filter(col("doc_id") % 50 === 0)
      .select("h").distinct()
    val contaminated = sh.filter(col("doc_id") % 50 =!= 0)
      .join(evalSh, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contam", lit(true))
    val wFp = Window.partitionBy(col("fp"))
    val flags = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("fp", md5(col("text")))
      .withColumn("c1", col("lang") === "en")
      .withColumn("c2", col("c1") &&
        col("n_tok") >= 5L && col("n_tok") <= 1000L)
      .withColumn("c3", col("c2") && col("doc_id") ===
        min(when(col("c2"), col("doc_id"))).over(wFp))
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("c4", col("c3") && col("doc_id") % 50 =!= 0 &&
        !coalesce(col("contam"), lit(false)))
    flags.agg(
        count(lit(1)).as("d0"), sum(col("n_tok")).as("t0"),
        sum(when(col("c1"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("c1"), col("n_tok")).otherwise(0L)).as("t1"),
        sum(when(col("c2"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("c2"), col("n_tok")).otherwise(0L)).as("t2"),
        sum(when(col("c3"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("c3"), col("n_tok")).otherwise(0L)).as("t3"),
        sum(when(col("c4"), 1L).otherwise(0L)).as("d4"),
        sum(when(col("c4"), col("n_tok")).otherwise(0L)).as("t4"))
      .select(expr("stack(5, " +
        "'1_raw', d0, t0, '2_lang', d1, t1, '3_quality', d2, t2, " +
        "'4_dedup', d3, t3, '5_decontam', d4, t4) " +
        "AS (stage, n_docs, n_tokens)"))
      .orderBy("stage")
  }
  private val w04Sql =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id,
       |    array_to_string(w[i:i+${CurK - 1}], ' ') AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM documents),
       |    unnest(generate_series(1, len(w) - ${CurK - 1})) AS t(i)
       |  WHERE len(w) >= $CurK),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE doc_id % 50 <> 0 AND g IN (
       |    SELECT g FROM sh WHERE doc_id % 50 = 0)),
       |flags AS (
       |  SELECT d.doc_id, d.n_tok, c1, c2,
       |    c2 AND d.doc_id = MIN(CASE WHEN c2 THEN d.doc_id END)
       |      OVER (PARTITION BY fp) AS c3
       |  FROM (
       |    SELECT doc_id, md5(text) AS fp,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |      lang = 'en' AS c1,
       |      lang = 'en' AND len(string_split(text, ' ')) >= 5
       |        AND len(string_split(text, ' ')) <= 1000 AS c2
       |    FROM documents) d),
       |f4 AS (
       |  SELECT f.*, f.c3 AND f.doc_id % 50 <> 0
       |      AND f.doc_id NOT IN (SELECT doc_id FROM contam) AS c4
       |  FROM flags f),
       |agg AS (
       |  SELECT
       |    CAST(COUNT(*) AS BIGINT) AS d0,
       |    CAST(SUM(n_tok) AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(SUM(CASE WHEN c1 THEN n_tok ELSE 0 END) AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
       |    CAST(SUM(CASE WHEN c2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
       |    CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
       |    CAST(SUM(CASE WHEN c3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
       |    CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
       |    CAST(SUM(CASE WHEN c4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4
       |  FROM f4)
       |SELECT '1_raw' AS stage, d0 AS n_docs, t0 AS n_tokens FROM agg
       |UNION ALL SELECT '2_lang', d1, t1 FROM agg
       |UNION ALL SELECT '3_quality', d2, t2 FROM agg
       |UNION ALL SELECT '4_dedup', d3, t3 FROM agg
       |UNION ALL SELECT '5_decontam', d4, t4 FROM agg
       |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------------
  // W05 — the production NEAR-duplicate curation pipeline as one flow
  // (w03/w04 dedup exactly; this is the fuzzy counterpart — the
  // RefinedWeb/SlimPajama-style chain):
  //   1. MinHash signatures + LSH banding (x02's kernel, verbatim —
  //      DedupSim.sigPairs, so the signature family is shared);
  //   2. verify: signature agreement ≥ 12/16 (est. Jaccard ≥ 0.75)
  //      hardens candidates into edges;
  //   3. cluster: connected components over the edge relation
  //      (large-star/small-star — O(log n) rounds at any diameter);
  //   4. survivorship: keep the min-doc_id copy per cluster;
  //   5. dataset card: one row of funnel counts.
  //
  // Scale shape: the edge generator is banded/bucketed (never
  // all-pairs); CC shuffles only the EDGE relation per round; the
  // survivor flag is a row-local equality on CC's min-label contract
  // (doc_id = cluster_id — no window); the final card is one
  // partial-agg pass over the corpus
  // left-joined with the small flag relation (join unhinted: dup
  // volume grows with the corpus). The edge relation is
  // lineage-cut once (Checkpoints.cut — localCheckpoint by default,
  // reliable under graft.checkpoint.dir) for its two consumers
  // (CC rounds + the dup_pairs count).
  // ---------------------------------------------------------------------
  private def w05(s: SparkSession, d: String): DataFrame = {
    val corpus = Tables.fanout(DedupSim.minhashCorpus(s, d))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val edges = graft.etl.Checkpoints.cut(DedupSim.neardupEdges(s, d))
    val cc = graft.etl.ConnectedComponents.run(edges)
    // CC's contract makes cluster_id the component's MIN doc_id, so
    // the survivor test is an equality — no window, no extra shuffle
    val flags = cc.select(col("id").as("doc_id"), col("cluster_id"))
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
    val ann = corpus.join(flags, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("is_survivor"), lit(true)))
    val card = ann.agg(
      count(lit(1)).as("docs_in"),
      // exactly one survivor per cluster ⇒ cluster count without a
      // distinct aggregate (no Expand in the plan)
      sum(when(col("is_survivor") === true, 1L).otherwise(0L))
        .as("n_clusters"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("docs_removed"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("docs_out"),
      sum(when(col("kept"), col("n_tok")).otherwise(0L))
        .as("tokens_out"))
    // 1×1 crossJoin of single-row aggregates (q14's scalar pattern)
    card.crossJoin(edges.agg(count(lit(1)).as("dup_pairs")))
  }
  private def w05Sql: String =
    s"""WITH RECURSIVE ${DedupSim.duckSigPairsCtes},
       |matches AS (
       |  SELECT doc_a, doc_b FROM sigm
       |  WHERE m >= ${DedupSim.NeardupMinSig}),
       |undirected AS (
       |  SELECT doc_a AS a, doc_b AS b FROM matches
       |  UNION ALL SELECT doc_b, doc_a FROM matches),
       |nodes AS (SELECT DISTINCT a AS id FROM undirected),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.id, u.b FROM reach JOIN undirected u
       |    ON u.a = reach.r),
       |cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
       |flags AS (
       |  SELECT id, cluster_id, id = cluster_id AS is_survivor
       |  FROM cc),
       |ann AS (
       |  SELECT c.doc_id,
       |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tok,
       |    f.is_survivor,
       |    COALESCE(f.is_survivor, TRUE) AS kept
       |  FROM corpus c LEFT JOIN flags f ON f.id = c.doc_id)
       |SELECT CAST(COUNT(*) AS BIGINT) AS docs_in,
       |  CAST(SUM(CASE WHEN is_survivor = TRUE THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_clusters,
       |  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
       |    AS docs_removed,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
       |    AS docs_out,
       |  CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
       |    AS tokens_out,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM matches) AS dup_pairs
       |FROM ann""".stripMargin

  // ---------------------------------------------------------------------
  // X74 — shard integrity manifest: the tamper-evidence layer a corpus
  // release ships next to its data files (did any shard change between
  // snapshot A and B? which one?). Per shard (doc_id % 16): an
  // ORDER-INDEPENDENT additive digest in the style of incremental
  // multiset hashing (AdHash, Bellare–Micciancio '97): each doc's leaf
  // is the oracle-portable PolyHash of its full canonical row string,
  // mixed by a Knuth multiply and SUMMED mod p. Commutativity is the
  // point at 100 TB: the digest is a commutative monoid, so it
  // partial-aggregates map-side, merges in any order, and an appended/
  // changed doc updates it in O(1) without re-reading the shard —
  // exactly the property a Merkle-LIST (positional chain) would lose
  // under distributed execution. The corpus root row (shard = -1)
  // folds the shard digests the same way, giving the single value two
  // releases compare first. Sums ride DECIMAL(38,0) so the
  // accumulation cannot overflow at any shard size (Spark long sums
  // wrap silently; DuckDB HUGEINT doesn't — parity demands decimal).
  // ---------------------------------------------------------------------
  private val MerkleP = 1000000007L
  private val MerkleMix = 2654435761L

  /** Per-shard AdHash digests of a documents frame (the x74 kernel,
    * shared with x78's snapshot diff). Checkpointed: every caller has
    * at least two consumers of the 16-row result. */
  private def shardDigests(docs: DataFrame): DataFrame = {
    val leaves = docs
      .withColumn("shard", col("doc_id") % 16)
      .withColumn("leaf", graft.functions.PolyHash(concat_ws("|",
        col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("text"))))
      .withColumn("mixed",
        expr(s"(leaf * ${MerkleMix}L) % ${MerkleP}L"))
    leaves.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        expr(s"CAST(SUM(CAST(mixed AS DECIMAL(38,0))) % ${MerkleP}L" +
          " AS BIGINT)").as("digest"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      // two consumers (manifest rows + the root fold): one corpus scan
      .cut(false)
  }
  /** DuckDB twin of [[shardDigests]]'s leaves CTE over `textExpr`.
    * Emitted as ONE line per CTE: callers interpolate this into
    * stripMargin'd SQL, and a continuation line starting with `||`
    * would lose a pipe to the margin strip. */
  private def duckShardCtes(tag: String, textExpr: String): String =
    (s"""leaves_$tag AS (
       |  SELECT doc_id % 16 AS shard, doc_id,
       |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_filter(string_split(
       |        doc_id || '|' || source || '|' || lang || '|' ||
       |          n_chars || '|' || ($textExpr), ''), ch -> ch <> ''),
       |        ch -> CAST(unicode(ch) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $MerkleP)
       |     * $MerkleMix) % $MerkleP AS mixed
       |  FROM documents),
       |shards_$tag AS (
       |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(mixed) % $MerkleP AS BIGINT) AS digest
       |  FROM leaves_$tag GROUP BY 1)""").stripMargin
      .replace("\n", " ")

  private def x74(s: SparkSession, d: String): DataFrame = {
    val shards = shardDigests(Tables.fanout(Tables.documents(s, d)))
    val root = shards
      .withColumn("remixed",
        expr(s"(digest * ${MerkleMix}L) % ${MerkleP}L"))
      .agg(sum(col("n_docs")).as("n_docs"),
        expr(s"CAST(SUM(CAST(remixed AS DECIMAL(38,0))) % ${MerkleP}L" +
          " AS BIGINT)").as("digest"),
        min(col("min_doc")).as("min_doc"), max(col("max_doc")).as("max_doc"))
      .select(lit(-1L).as("shard"), col("n_docs"), col("digest"),
        col("min_doc"), col("max_doc"))
    shards.select(col("shard"), col("n_docs"), col("digest"),
        col("min_doc"), col("max_doc"))
      .union(root)
      .orderBy("shard")
  }
  private val x74Sql =
    s"""WITH leaves AS (
       |  SELECT doc_id % 16 AS shard, doc_id,
       |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_filter(string_split(
       |        doc_id || '|' || source || '|' || lang || '|'
       |          || n_chars || '|' || text, ''), ch -> ch <> ''),
       |        ch -> CAST(unicode(ch) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $MerkleP)
       |     * $MerkleMix) % $MerkleP AS mixed
       |  FROM documents),
       |shards AS (
       |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(mixed) % $MerkleP AS BIGINT) AS digest,
       |    MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |  FROM leaves GROUP BY 1),
       |root AS (
       |  SELECT CAST(-1 AS BIGINT) AS shard,
       |    CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |    CAST(SUM((digest * $MerkleMix) % $MerkleP) % $MerkleP
       |      AS BIGINT) AS digest,
       |    MIN(min_doc) AS min_doc, MAX(max_doc) AS max_doc
       |  FROM shards)
       |SELECT * FROM shards UNION ALL SELECT * FROM root
       |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // X78 — manifest diff: the USE of x74's digests — given two corpus
  // snapshots, localize what changed without comparing a single row
  // of data. Snapshot B plants a deterministic perturbation (docs
  // with doc_id % 101 = 7 gain one byte); the diff joins the two
  // 16-row manifests keyed on shard and flags digest inequality, plus
  // the root row (shard −1, the single compare a release check runs
  // first). At 100 TB both sides are metadata-sized manifests — the
  // corpus scans happened once each at snapshot time; TamperSpec pins
  // detection (every planted shard flips) AND specificity (an
  // untouched shard's digest is bit-identical across snapshots).
  // ---------------------------------------------------------------------
  private def x78(s: SparkSession, d: String): DataFrame = {
    val base = Tables.fanout(Tables.documents(s, d)).cut(false)
    val a = shardDigests(base)
      .select(col("shard"), col("n_docs").as("n_a"),
        col("digest").as("digest_a"))
    val b = shardDigests(base.withColumn("text",
        when(col("doc_id") % 101 === 7, concat(col("text"), lit("!")))
          .otherwise(col("text"))))
      .select(col("shard"), col("n_docs").as("n_b"),
        col("digest").as("digest_b"))
    val perShard = a.join(b, Seq("shard"))
    val root = perShard
      .agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"),
        expr(s"CAST(SUM(CAST((digest_a * ${MerkleMix}L) % ${MerkleP}L" +
          s" AS DECIMAL(38,0))) % ${MerkleP}L AS BIGINT)")
          .as("digest_a"),
        expr(s"CAST(SUM(CAST((digest_b * ${MerkleMix}L) % ${MerkleP}L" +
          s" AS DECIMAL(38,0))) % ${MerkleP}L AS BIGINT)")
          .as("digest_b"))
      .select(lit(-1L).as("shard"), col("n_a"), col("n_b"),
        col("digest_a"), col("digest_b"))
    perShard.unionByName(root)
      .withColumn("changed",
        (col("digest_a") =!= col("digest_b")).cast("long"))
      .select("shard", "n_a", "n_b", "digest_a", "digest_b", "changed")
      .orderBy("shard")
  }
  private lazy val x78Sql =
    s"""WITH ${duckShardCtes("a", "text")},
       |${duckShardCtes("b",
          "CASE WHEN doc_id % 101 = 7 THEN text || '!' ELSE text END")},
       |per AS (
       |  SELECT a.shard, a.n_docs AS n_a, b.n_docs AS n_b,
       |    a.digest AS digest_a, b.digest AS digest_b
       |  FROM shards_a a JOIN shards_b b USING (shard)),
       |root AS (
       |  SELECT CAST(-1 AS BIGINT) AS shard,
       |    CAST(SUM(n_a) AS BIGINT) AS n_a,
       |    CAST(SUM(n_b) AS BIGINT) AS n_b,
       |    CAST(SUM((digest_a * $MerkleMix) % $MerkleP) % $MerkleP
       |      AS BIGINT) AS digest_a,
       |    CAST(SUM((digest_b * $MerkleMix) % $MerkleP) % $MerkleP
       |      AS BIGINT) AS digest_b
       |  FROM per),
       |u AS (SELECT * FROM per UNION ALL SELECT * FROM root)
       |SELECT *, CAST(CASE WHEN digest_a <> digest_b THEN 1 ELSE 0 END
       |  AS BIGINT) AS changed
       |FROM u ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // X76 — license/policy gate: the compliance audit a corpus release
  // runs before training — which token mass is actually trainable
  // under each source's license class? The license registry is the
  // canonical BROADCAST-DIM shape (a few thousand sources at any
  // corpus size — here derived deterministically from the source id,
  // in production a curated table): distinct sources → class, joined
  // back broadcast so the corpus-side scan stays one pass with no
  // wide shuffle. Per class: sources, docs, token mass at x08's
  // whitespace grain, the trainable verdict (permissive/attribution
  // train; noncommercial/restricted don't), share of total tokens in
  // exact ppm (1-row scalar crossJoin, a17's pattern) and the gated
  // token mass the release may keep.
  // ---------------------------------------------------------------------
  private def x76(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanout(Tables.documents(s, d))
      .withColumn("n_tok",
        size(split(col("text"), "\\s+")).cast("long"))
      // two consumers (registry distinct + the class join): one scan
      .cut(false)
    val registry = docs.select(col("source")).distinct()
      .withColumn("lic_id",
        expr("CAST(substr(source, 4) AS INT) % 4"))
      .withColumn("license", expr(
        """CASE lic_id WHEN 0 THEN 'permissive' WHEN 1 THEN 'attribution'
          |WHEN 2 THEN 'noncommercial' ELSE 'restricted' END"""
          .stripMargin.replace("\n", " ")))
      .withColumn("trainable",
        (col("lic_id") <= 1).cast("long"))
      .drop("lic_id")
    // source counts come from the registry itself (already one row
    // per source) — keeps the corpus-side agg free of the
    // countDistinct Expand fan-out
    val perClassSrc = registry.groupBy(col("license"), col("trainable"))
      .agg(count(lit(1)).as("n_sources"))
    val perClass = docs.join(broadcast(registry), Seq("source"))
      .groupBy(col("license"), col("trainable"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .join(broadcast(perClassSrc), Seq("license", "trainable"))
      // 4-row class rollup consumed twice (rows + the total scalar)
      .cut(false)
    val total = perClass.agg(sum(col("tokens")).as("total_tok"))
    perClass.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("(1000000L * tokens) div total_tok"))
      .withColumn("gated_tokens",
        col("trainable") * col("tokens"))
      .select("license", "trainable", "n_sources", "n_docs", "tokens",
        "share_ppm", "gated_tokens")
      .orderBy("license")
  }
  private val x76Sql =
    """WITH docs AS (
      |  SELECT source,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |registry AS (
      |  SELECT source,
      |    CASE CAST(substr(source, 4) AS INT) % 4
      |      WHEN 0 THEN 'permissive' WHEN 1 THEN 'attribution'
      |      WHEN 2 THEN 'noncommercial' ELSE 'restricted' END AS license,
      |    CAST(CASE WHEN CAST(substr(source, 4) AS INT) % 4 <= 1
      |      THEN 1 ELSE 0 END AS BIGINT) AS trainable
      |  FROM (SELECT DISTINCT source FROM docs)),
      |per_class AS (
      |  SELECT r.license, r.trainable,
      |    CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(d.n_tok) AS BIGINT) AS tokens
      |  FROM docs d JOIN registry r USING (source)
      |  GROUP BY 1, 2),
      |total AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tok
      |          FROM per_class)
      |SELECT license, trainable, n_sources, n_docs, tokens,
      |  (1000000 * tokens) // total_tok AS share_ppm,
      |  trainable * tokens AS gated_tokens
      |FROM per_class CROSS JOIN total
      |ORDER BY license""".stripMargin

  // ---------------------------------------------------------------------
  // X100 — sequence packing for pretraining shard assembly: the step
  // between a curated corpus and a training run — documents are
  // concatenated in a deterministic order and chunked into fixed
  // token-budget shards (GPT-style concat-and-chunk at B = 2048).
  // Each doc's shard is a pure function of the exclusive per-source
  // prefix sum of token counts (x08's whitespace grain), so the whole
  // packing is exact integers and cross-engine-gated. The census
  // prices what packing costs: `n_spanning` counts docs straddling a
  // shard boundary (attention-mask breaks or truncation waste —
  // the number packing-efficiency work optimizes), `started_tokens`
  // the shard's inflow. Scale: packing is per-SOURCE streams (sources
  // pack independently — the domain-mixture contract), so the prefix
  // sum is a per-source window (Spark's standard two-phase prefix
  // sum), never one global ordering; the census contracts to
  // total_tokens/B rows. The doc_id order stands in for the curated
  // sample order a real run would draw (x50's split keys / cluster
  // weights compose upstream).
  // ---------------------------------------------------------------------
  private val PackBudget = 2048L

  private def x100(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = toks
      .withColumn("start_tok",
        coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("shard", expr(s"start_tok div $PackBudget"))
      .withColumn("spans", expr(
        s"CASE WHEN (start_tok + n_tok - 1) div $PackBudget" +
          s" > start_tok div $PackBudget THEN 1L ELSE 0L END"))
    marked.groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("spans").as("n_spanning"),
        sum("n_tok").as("started_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "shard")
  }
  private lazy val x100Sql =
    s"""WITH toks AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
       |      AS n_tok
       |  FROM documents),
       |pos AS (
       |  SELECT source, doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM toks),
       |marked AS (
       |  SELECT source, doc_id, n_tok, start_tok,
       |    start_tok // $PackBudget AS shard,
       |    CASE WHEN (start_tok + n_tok - 1) // $PackBudget
       |        > start_tok // $PackBudget
       |      THEN 1 ELSE 0 END AS spans
       |  FROM pos)
       |SELECT source, CAST(shard AS BIGINT) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(spans) AS BIGINT) AS n_spanning,
       |  CAST(SUM(n_tok) AS BIGINT) AS started_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM marked GROUP BY 1, 2
       |ORDER BY source, shard""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("x76_license_gate", Some(x76Sql), x76),
    QueryDef("w03_corpus_etl", Some(w03Sql), w03),
    QueryDef("w04_curation_funnel", Some(w04Sql), w04),
    QueryDef("w05_neardup_funnel", Some(w05Sql), w05),
    QueryDef("x74_merkle_manifest", Some(x74Sql), x74),
    QueryDef("x78_manifest_diff", Some(x78Sql), x78),
    QueryDef("x100_sequence_pack", Some(x100Sql), x100)
  )
}
