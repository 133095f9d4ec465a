package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.etl.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral/statistical analytics beyond the reference's corpus:
  * engagement streaks, distribution-drift and digit-law audits, fuzzy
  * (edit-distance) entity matching, and weighted corpus sampling.
  *
  * These extend the reference's data-quality surface (validation.sql's
  * range/null/orphan checks — SURVEY §2.4) with the next tier of audit
  * a production warehouse runs: "did the distribution shift", "are the
  * values organic", "which near-identical labels should merge". Every
  * query keeps the 100 TB plan shape: keyed shuffles only, broadcast
  * scalar pre-passes for global bounds, distinct-domain contraction
  * before any pairwise work.
  */
object Insights {

  // ---------------------------------------------------------------------
  // A18 — activity streaks (gaps-and-islands). Longest run of
  // consecutive active days per user — the canonical engagement metric
  // the a14 WAU / a15 growth / a16 retention family was missing.
  // Islands via the textbook day-index-minus-row-number trick: one
  // shuffle to (user, day) grain, one per-user window (partitioned
  // sort, never global), then two keyed aggregates.
  // ---------------------------------------------------------------------
  private def a18(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_days"),
        min(col("start_day")).as("first_day"))
      .orderBy("user_id")
  }
  private val a18Sql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id, day,
      |    (day - DATE '1970-01-01')
      |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM days),
      |st AS (
      |  SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(SUM(len) AS BIGINT) AS n_active_days,
      |  MIN(start_day) AS first_day
      |FROM st GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q32 — Benford leading-digit audit. Fraud/synthetic-data screening
  // for a measure column: the observed first-significant-digit
  // frequency of o_totalprice. Digit extraction goes through integer
  // cents (ROUND(x*100) → BIGINT → string head) because int→string is
  // engine-identical while double→string formatting is not. One
  // codegen'd row pass + a 9-row aggregate; the pct divisions are
  // single exactly-rounded IEEE ops over exact integers, so the oracle
  // matches bit-for-bit.
  // ---------------------------------------------------------------------
  private def q32(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1)
        .as("leading_digit"))
      .groupBy("leading_digit")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy() // 9-row post-agg relation: safe
    counts
      .withColumn("pct",
        col("n").cast("double") / sum(col("n")).over(w).cast("double"))
      .orderBy("leading_digit")
  }
  private val q32Sql =
    """WITH c AS (
      |  SELECT substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS leading_digit,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
      |  GROUP BY 1)
      |SELECT leading_digit, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS pct
      |FROM c ORDER BY leading_digit""".stripMargin

  // ---------------------------------------------------------------------
  // Q33 — distribution drift between time halves. Splits the event
  // stream at the midpoint of its day range (broadcast 1-row min/max
  // pre-pass, integer day arithmetic) and compares the event-type mix
  // of the two halves — the shape of a training-data drift monitor.
  // Per-type rates are exactly-rounded divisions of exact counts; the
  // drift is ONE subtraction of those — no float accumulation, so no
  // engine-order divergence. Sum-of-|diff| (total variation) is left
  // to the caller precisely because summing doubles is order-dependent.
  // ---------------------------------------------------------------------
  private def q33(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("epoch_day"))
    val bounds = ev.agg(min("epoch_day").as("lo"), max("epoch_day").as("hi"))
    val counts = ev.crossJoin(broadcast(bounds))
      .withColumn("early",
        (col("epoch_day") < col("lo") +
          expr("(hi - lo + 1) div 2")).cast("long"))
      .groupBy("event_type")
      .agg(sum(col("early")).as("n_early"),
        sum(lit(1L) - col("early")).as("n_late"))
    val w = Window.partitionBy() // bounded event-type domain post-agg
    val rE = col("n_early").cast("double") /
      sum(col("n_early")).over(w).cast("double")
    val rL = col("n_late").cast("double") /
      sum(col("n_late")).over(w).cast("double")
    counts
      .withColumn("rate_early", rE)
      .withColumn("rate_late", rL)
      .withColumn("drift", abs(col("rate_early") - col("rate_late")))
      .orderBy(desc("drift"), col("event_type"))
  }
  private val q33Sql =
    """WITH ev AS (
      |  SELECT event_type,
      |    (CAST(ts AS DATE) - DATE '1970-01-01') AS epoch_day
      |  FROM events),
      |b AS (SELECT MIN(epoch_day) AS lo, MAX(epoch_day) AS hi FROM ev),
      |c AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN epoch_day < lo + (hi - lo + 1) // 2
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
      |    CAST(SUM(CASE WHEN epoch_day < lo + (hi - lo + 1) // 2
      |      THEN 0 ELSE 1 END) AS BIGINT) AS n_late
      |  FROM ev CROSS JOIN b GROUP BY 1)
      |SELECT event_type, n_early, n_late,
      |  CAST(n_early AS DOUBLE) / CAST(SUM(n_early) OVER () AS DOUBLE)
      |    AS rate_early,
      |  CAST(n_late AS DOUBLE) / CAST(SUM(n_late) OVER () AS DOUBLE)
      |    AS rate_late,
      |  ABS(CAST(n_early AS DOUBLE) / CAST(SUM(n_early) OVER ()
      |      AS DOUBLE)
      |    - CAST(n_late AS DOUBLE) / CAST(SUM(n_late) OVER ()
      |      AS DOUBLE)) AS drift
      |FROM c ORDER BY drift DESC, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // J15 — fuzzy (edit-distance) label matching. Which near-identical
  // part names should an entity-resolution pass merge? The 100 TB-safe
  // shape: contract to the DISTINCT label domain first (a keyed agg —
  // labels are a vocabulary, not a corpus), then pair WITHIN equi-join
  // blocks (last token) under a length band, then levenshtein ≤ 2.
  // Pairwise work is bounded by vocabulary², never corpus²; per-label
  // row counts ride along so the caller can weigh merges.
  // ---------------------------------------------------------------------
  private def j15(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", substring_index(col("p_name"), " ", -1))
    val a = names.select(col("p_name").as("name_a"),
      col("n_parts").as("n_a"), col("block"))
    val b = names.select(col("p_name").as("name_b"),
      col("n_parts").as("n_b"), col("block"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"),
        col("n_b"))
      .orderBy("name_a", "name_b")
  }
  private val j15Sql =
    """WITH names AS (
      |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |    str_split(p_name, ' ')[-1] AS block
      |  FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM names a JOIN names b
      |  ON a.block = b.block AND a.p_name < b.p_name
      |WHERE ABS(length(a.p_name) - length(b.p_name)) <= 2
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // X36 — weighted (probability-proportional-to-size) sampling gate.
  // Sample docs with probability ∝ n_chars toward an expected target
  // count — the standard size-weighted corpus subsample (big docs are
  // more likely kept; x24 stratifies uniformly, x13/x30 reweight by
  // source). Zero-shuffle row-local gate: broadcast 1-row total-weight
  // pre-pass, then keep iff h·W < target·w·10^6 — all-integer
  // cross-multiplication, no division, engine-exact. Products stay
  // under 2^63 while 10^6·W < 2^63 (W ≈ 9.2×10^12 total chars ≈ 9 TB
  // of text); past that, move the gate to DECIMAL(38,0) unchanged.
  // Docs with target·w ≥ W·10^-6·10^6 are kept with certainty — the
  // documented PPS saturation for heavyweight items.
  // ---------------------------------------------------------------------
  private val SampleTarget = 500L

  private def x36(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("h", pmod(
        (col("doc_id") % 2147483648L) * 2654435761L + 13L,
        lit(1000000L)))
    val tot = docs.agg(sum(col("n_chars")).as("total_w"))
    docs.crossJoin(broadcast(tot))
      .withColumn("keep", col("h") * col("total_w") <
        lit(SampleTarget) * col("n_chars") * lit(1000000L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L))
          .as("chars_sampled"))
      .orderBy("source")
  }
  private val x36Sql =
    s"""WITH t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_w
       |  FROM documents),
       |g AS (
       |  SELECT source, n_chars,
       |    CASE WHEN ((doc_id % 2147483648) * 2654435761 + 13) % 1000000
       |        * total_w < $SampleTarget * n_chars * 1000000
       |      THEN 1 ELSE 0 END AS keep
       |  FROM documents CROSS JOIN t)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(keep) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS chars_sampled
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q34 — functional-dependency audit. Does X determine Y (here:
  // p_brand → p_type)? The profiling question behind schema inference
  // and key discovery. One keyed partial-agg pass; rows come back only
  // for violating X values, with the distinct-Y count, support, and
  // the min/max Y as concrete witnesses. Completes the validation
  // family (q02 PK, q03 FK, q04 NULL, q06 ranges) with the dependency
  // dimension the reference's corpus never checks.
  // ---------------------------------------------------------------------
  private def q34(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("p_type")).as("n_types"),
        count(lit(1)).as("n_rows"),
        min(col("p_type")).as("type_min"),
        max(col("p_type")).as("type_max"))
      .filter(col("n_types") > 1)
      .orderBy("p_brand")
  }
  private val q34Sql =
    """SELECT p_brand,
      |  CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(p_type) AS type_min, MAX(p_type) AS type_max
      |FROM part GROUP BY 1 HAVING COUNT(DISTINCT p_type) > 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q50 — FD repair proposal: the ACT step after q34's audit. For
  // every determinant value violating p_brand → p_type, the repair a
  // data steward would apply: the DETERMINISTIC modal p_type (count
  // DESC, value ASC — a19's tie rule, never the engine-arbitrary
  // mode()), how many rows already conform, and how many a repair
  // would rewrite. Completes the quality family's audit→act loop
  // (q02/q03/q04/q06/q34 say what's wrong; this says what the fix
  // is and what it costs). One keyed count pass + a window over the
  // CONTRACTED (brand, type) domain — never the fact rows.
  // ---------------------------------------------------------------------
  private def q50(s: SparkSession, d: String): DataFrame = {
    val c = Tables.part(s, d)
      .groupBy(col("p_brand"), col("p_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("p_brand")
      .orderBy(desc("n"), col("p_type"))
    c.withColumn("rn", row_number().over(w))
      .groupBy(col("p_brand"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_types"),
        max(when(col("rn") === 1, col("p_type"))).as("repair_type"),
        max(when(col("rn") === 1, col("n"))).as("modal_count"))
      .filter(col("n_types") > 1)
      .select(col("p_brand"), col("n_rows"), col("n_types"),
        col("repair_type"), col("modal_count"),
        (col("n_rows") - col("modal_count")).as("rows_to_fix"))
      .orderBy("p_brand")
  }
  private val q50Sql =
    """WITH c AS (
      |  SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM part GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
      |    ORDER BY n DESC, p_type) AS rn
      |  FROM c),
      |s AS (
      |  SELECT p_brand, CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    MAX(CASE WHEN rn = 1 THEN p_type END) AS repair_type,
      |    CAST(MAX(CASE WHEN rn = 1 THEN n END) AS BIGINT)
      |      AS modal_count
      |  FROM r GROUP BY 1 HAVING COUNT(*) > 1)
      |SELECT p_brand, n_rows, n_types, repair_type, modal_count,
      |  n_rows - modal_count AS rows_to_fix
      |FROM s ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------------
  // A19 — deterministic per-group mode. The modal o_orderpriority per
  // order status, as the explicit argmax (count DESC, value ASC) —
  // NOT the built-in mode(), whose tie choice is engine-arbitrary.
  // Count-then-window: the ranking window runs over the contracted
  // (status, priority) domain, never the fact rows.
  // ---------------------------------------------------------------------
  private def a19(s: SparkSession, d: String): DataFrame = {
    val c = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(desc("n"), col("o_orderpriority"))
    c.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority")
        .as("modal_priority"), col("n"))
      .orderBy("o_orderstatus")
  }
  private val a19Sql =
    """WITH c AS (
      |  SELECT o_orderstatus, o_orderpriority,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT o_orderstatus, o_orderpriority, n,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY n DESC, o_orderpriority) AS rn
      |  FROM c)
      |SELECT o_orderstatus, o_orderpriority AS modal_priority, n
      |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // X37 — shingle-containment detection: doc pairs where one document's
  // 8-token shingle set is (nearly) contained in the other's — catches
  // quote/excerpt/superset duplication that symmetric Jaccard (x04) and
  // span coverage (x32) under-report. Scale shape: DISTINCT per-doc
  // shingle sets, document-frequency band [2, DfCap] before the
  // pair-generating self-join (candidate volume is Σdf² over the band,
  // independent of corpus size per shingle), exact set-size join after.
  // The reported containment is the df-banded lower bound — ultra-hot
  // boilerplate shingles are excluded by definition of the audit.
  // Deterministic top-N: containment DESC, then the pair key.
  // CHECKED INVARIANT (HashCollisionAuditSpec): the Spark side
  // distinct-counts xxhash64(shingle) so no text ever shuffles; the
  // oracle distinct-counts raw shingles (DuckDB has no xxhash64, and
  // its hash() would just substitute a DIFFERENT 64-bit collision
  // set, not align them). The spec asserts raw-vs-hashed distinct
  // counts are equal on the corpus at global, per-doc, and per-source
  // grains, so a collision turns a NAMED test red instead of an
  // unexplained oracle mismatch. At 10¹² corpus shingles the expected
  // handful of collisions moves an audit metric by ±1 pair count,
  // which the df-banded lower-bound semantics already absorb.
  // ---------------------------------------------------------------------
  private val ContainK = 8
  private val ContainDfCap = 50
  private val ContainTopN = 50

  private def x37(s: SparkSession, d: String): DataFrame = {
    val k = ContainK
    val sh = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - k),
          i => xxhash64(concat_ws(" ",
            slice(col("w"), i + 1, lit(k)))))).as("h"))
      .distinct()
      // four consumers (sizes, df band, both pair-join sides):
      // checkpoint the distinct shingle-set relation once instead of
      // re-deriving the explode+distinct lineage per consumer
      .cut(false)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val banded = sh.join(
      sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= ContainDfCap)
        .select("h"),
      "h")
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("n_sh").as("n_b")), "doc_b")
      .withColumn("containment", col("shared").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"),
        col("n_b"), col("containment"))
      .orderBy(desc("containment"), col("doc_a"), col("doc_b"))
      .limit(ContainTopN)
  }
  private val x37Sql =
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    array_to_string(w[i:i+${ContainK - 1}], ' ') AS g
       |  FROM base, unnest(generate_series(1, len(w) - ${ContainK - 1}))
       |    AS t(i)
       |  WHERE len(w) >= $ContainK),
       |sizes AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
       |  FROM sh GROUP BY 1),
       |band AS (
       |  SELECT g FROM sh GROUP BY g
       |  HAVING COUNT(*) BETWEEN 2 AND $ContainDfCap),
       |el AS (SELECT doc_id, g FROM sh JOIN band USING (g)),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared
       |  FROM el a JOIN el b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, p.shared, sa.n_sh AS n_a,
       |  sb.n_sh AS n_b,
       |  CAST(p.shared AS DOUBLE) /
       |    CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
       |FROM p
       |JOIN sizes sa ON p.doc_a = sa.doc_id
       |JOIN sizes sb ON p.doc_b = sb.doc_id
       |ORDER BY containment DESC, doc_a, doc_b
       |LIMIT $ContainTopN""".stripMargin

  // ---------------------------------------------------------------------
  // Q35 — per-group Pearson correlation from EXACT moment sums. The
  // built-in corr() accumulates doubles in partition order, so its
  // last bits are nondeterministic across engines (and across runs at
  // different parallelism). Here the five moments (n, Σx, Σy, Σxy,
  // Σx², Σy²) accumulate as decimals — exact, any merge order — and r
  // is assembled from them with a fixed expression shape, so every
  // IEEE op is exactly rounded over identical operands in both
  // engines: bit-for-bit reproducible at any cluster size. One
  // partial-agg pass over lineitem.
  // ---------------------------------------------------------------------
  private def q35(s: SparkSession, d: String): DataFrame = {
    // Inputs cast to DECIMAL(18,2) FIRST (2-decimal money/quantity
    // values: the 0.01 quantum dwarfs the double's ulp, so both
    // engines round identically), then all products happen in exact
    // decimal arithmetic. Casting the double PRODUCT instead is a
    // trap: ulp(price²) ≈ 5e-7 is the size of a 6-decimal quantum, so
    // engines disagree on the last decimal row by row (measured: Σy²
    // off by 0.02 at sf1 before this was moved input-side).
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    val m = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).as("sx"),
        sum(dec(col("l_extendedprice"))).as("sy"),
        sum(dec(col("l_quantity")) * dec(col("l_extendedprice")))
          .as("sxy"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sxx"),
        sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))
          .as("syy"))
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    m.select(col("l_returnflag"), col("n"),
        (sx / nD).as("avg_qty"), (sy / nD).as("avg_price"),
        ((nD * col("sxy").cast("double") - sx * sy) /
          (sqrt(nD * col("sxx").cast("double") - sx * sx) *
            sqrt(nD * col("syy").cast("double") - sy * sy)))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }
  // Oracle note: the moments convert decimal→double VIA VARCHAR.
  // DuckDB's direct DECIMAL→DOUBLE cast double-rounds once the scaled
  // int128 exceeds 2^53 (measured: Σprice² off by 1 ulp at sf0.01),
  // while its VARCHAR→DOUBLE parse — like Spark's BigDecimal cast — is
  // correctly rounded, so both engines land on the identical double.
  private val q35Sql =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n,
      |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
      |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
      |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
      |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
      |    CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd
      |  FROM m)
      |SELECT l_returnflag, n,
      |  sxd / CAST(n AS DOUBLE) AS avg_qty,
      |  syd / CAST(n AS DOUBLE) AS avg_price,
      |  (CAST(n AS DOUBLE) * sxyd - sxd * syd)
      |    / (SQRT(CAST(n AS DOUBLE) * sxxd - sxd * sxd)
      |      * SQRT(CAST(n AS DOUBLE) * syyd - syd * syd))
      |    AS corr_qty_price
      |FROM d ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // A20 — time-weighted average (TWA): the metric-engine primitive for
  // irregularly sampled series — each reading weighted by how long it
  // was current (to the next event), so a burst of samples doesn't
  // dominate a sparse stretch. One per-user window (lead) + one keyed
  // agg. Exactness discipline: value is quantized to DECIMAL(18,6)
  // (quantum ≫ double ulp → both engines round identically), the µs
  // interval is exact integer, their product and sums are exact
  // decimals, and the single final division is one exactly-rounded
  // IEEE op — bit-identical at any parallelism.
  // ---------------------------------------------------------------------
  private def a20(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v6"))
      .withColumn("dt_us",
        (unix_micros(lead(col("ts"), 1).over(w)) -
          unix_micros(col("ts"))))
      .filter(col("dt_us").isNotNull)
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("span_us"),
        (sum(col("v6") * col("dt_us").cast("decimal(19,0)"))
          .cast("double") /
          sum(col("dt_us")).cast("double")).as("twa_value"))
      .orderBy("user_id")
  }
  private val a20Sql =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(value AS DECIMAL(18,6)) AS v6,
      |    epoch_us(LEAD(ts, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
      |  FROM events),
      |f AS (SELECT * FROM ev WHERE dt_us IS NOT NULL)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(dt_us) AS BIGINT) AS span_us,
      |  CAST(CAST(SUM(v6 * CAST(dt_us AS DECIMAL(19,0))) AS VARCHAR)
      |      AS DOUBLE)
      |    / CAST(CAST(CAST(SUM(dt_us) AS BIGINT) AS VARCHAR) AS DOUBLE)
      |    AS twa_value
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q36 — contingency / association audit between two categorical
  // columns (market segment × nation): observed cell counts vs the
  // independence expectation (row·col/grand totals) and the lift
  // ratio. The categorical-correlation complement of q35; flags cells
  // whose lift strays from 1. One keyed agg to the bounded cell grid;
  // the marginals are window sums OVER THAT GRID, never the fact
  // rows. Expected/lift are exactly-rounded divisions of exact counts.
  // ---------------------------------------------------------------------
  private def q36(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.customer(s, d)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_obs"))
    val wSeg = Window.partitionBy("c_mktsegment")
    val wNat = Window.partitionBy("c_nationkey")
    val wAll = Window.partitionBy()
    cells
      .withColumn("n_exp",
        sum(col("n_obs")).over(wSeg).cast("double") *
          sum(col("n_obs")).over(wNat).cast("double") /
          sum(col("n_obs")).over(wAll).cast("double"))
      .withColumn("lift", col("n_obs").cast("double") / col("n_exp"))
      .orderBy("c_mktsegment", "c_nationkey")
  }
  private val q36Sql =
    """WITH cells AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM customer GROUP BY 1, 2),
      |e AS (
      |  SELECT c_mktsegment, c_nationkey, n_obs,
      |    CAST(SUM(n_obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
      |      * CAST(SUM(n_obs) OVER (PARTITION BY c_nationkey)
      |          AS DOUBLE)
      |      / CAST(SUM(n_obs) OVER () AS DOUBLE) AS n_exp
      |  FROM cells)
      |SELECT c_mktsegment, c_nationkey, n_obs, n_exp,
      |  CAST(n_obs AS DOUBLE) / n_exp AS lift
      |FROM e ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // Q37 — categorical concentration profile (Gini impurity) across
  // columns. Entropy needs log (engine-divergent in the last ulp);
  // Gini 1 − Σp² doesn't: Σn² is an exact decimal sum of integers and
  // the single division n²/T² is one exactly-rounded IEEE op — an
  // engine-exact diversity score. Each column contracts to its value
  // domain with one keyed agg; the three profiles union. DECIMAL(38,0)
  // for Σn² keeps the sum exact out to n ≈ 10¹⁹ per value.
  // ---------------------------------------------------------------------
  private def q37(s: SparkSession, d: String): DataFrame = {
    def profile(df: DataFrame, column: String, label: String) = {
      val counts = df.groupBy(col(column).as("v"))
        .agg(count(lit(1)).as("n"))
      counts.agg(
        lit(label).as("column_name"),
        count(lit(1)).as("n_distinct"),
        sum(col("n")).as("n_rows"),
        (lit(1.0) -
          sum((col("n") * col("n")).cast("decimal(38,0)")).cast("double")
            / (sum(col("n")).cast("double") *
              sum(col("n")).cast("double"))).as("gini"))
    }
    profile(Tables.events(s, d), "event_type", "events.event_type")
      .unionByName(profile(Tables.orders(s, d), "o_orderstatus",
        "orders.o_orderstatus"))
      .unionByName(profile(Tables.customer(s, d), "c_mktsegment",
        "customer.c_mktsegment"))
      .orderBy("column_name")
  }
  private val q37Sql =
    """WITH p AS (
      |  SELECT 'events.event_type' AS column_name, event_type AS v,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'orders.o_orderstatus', o_orderstatus,
      |    CAST(COUNT(*) AS BIGINT) FROM orders GROUP BY 2
      |  UNION ALL
      |  SELECT 'customer.c_mktsegment', c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) FROM customer GROUP BY 2)
      |SELECT column_name, CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  1.0 - CAST(CAST(SUM(CAST(n * n AS DECIMAL(38,0))) AS VARCHAR)
      |      AS DOUBLE)
      |    / (CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE)
      |      * CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE)) AS gini
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // X38 — boilerplate template detection: document PREFIXES shared
  // across many docs (mail headers, license banners, scraped nav
  // chrome — template spam that survives exact whole-doc dedup because
  // the tails differ). Fingerprint the first K tokens row-locally,
  // one keyed agg to the template domain, report templates hitting
  // ≥ MinDocs docs with doc/source spread; the sample text rides along
  // via min() so no second join back to the corpus.
  // ---------------------------------------------------------------------
  private val TemplateK = 8
  private val TemplateMinDocs = 3

  private def x38(s: SparkSession, d: String): DataFrame = {
    val k = TemplateK
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), col("source"),
        concat_ws(" ", slice(col("w"), 1, k)).as("prefix"))
    docs.groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= TemplateMinDocs)
      .orderBy(desc("n_docs"), col("prefix"))
  }
  private val x38Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS w
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source,
       |    array_to_string(w[1:$TemplateK], ' ') AS prefix
       |  FROM d WHERE len(w) >= $TemplateK)
       |SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |  MIN(doc_id) AS example_doc
       |FROM p GROUP BY 1 HAVING COUNT(*) >= $TemplateMinDocs
       |ORDER BY n_docs DESC, prefix""".stripMargin

  // ---------------------------------------------------------------------
  // X39 — embedding centroid / dispersion profile per class: the
  // clustering-quality audit run before trusting labels or IVF
  // codebooks (tight classes → good separation; a dispersed class →
  // label noise). Plan: explode to (label, dim, v) — one keyed shuffle
  // to the bounded (label × 64) grid — per-dim mean from exact decimal
  // sums (components quantized to DECIMAL(18,6): quantum ≫ float ulp,
  // both engines round the same exact binary value identically), the
  // centroid reassembled as a dim-ordered array, broadcast back, and
  // each vector's distance computed as an IN-ROW left-to-right fold
  // (the x05 dot-product discipline — no cross-row float order). Only
  // the final per-class distance average crosses rows, and it re-enters
  // decimal before summing.
  // ---------------------------------------------------------------------
  private def x39(s: SparkSession, d: String): DataFrame = {
    val base = Tables.fanout(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val cells = base
      .select(col("label"), posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("v").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("c"))
    val cents = cells.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("c")))), s => s.getField("c")).as("cent"))
      .withColumn("centroid_norm",
        sqrt(expr("aggregate(transform(cent, c -> c * c), " +
          "CAST(0.0 AS DOUBLE), (a, v) -> a + v)")))
    val dists = base.join(broadcast(cents), "label")
      .withColumn("dist", sqrt(expr(
        "aggregate(zip_with(emb, cent, (x, c) -> (x - c) * (x - c)), " +
          "CAST(0.0 AS DOUBLE), (a, v) -> a + v)")))
    dists.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("centroid_norm")).as("centroid_norm"),
        (sum(col("dist").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_dist"),
        max(col("dist")).as("max_dist"))
      .orderBy("label")
  }
  private val x39Sql =
    """WITH cells AS (
      |  SELECT label, i - 1 AS dim,
      |    CAST(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
      |        AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM embeddings,
      |    unnest(generate_series(1, len(embedding))) AS t(i)
      |  GROUP BY 1, 2),
      |cents AS (
      |  SELECT label, list(c ORDER BY dim) AS cent,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list(c ORDER BY dim), c -> c * c)),
      |      (a, v) -> a + v)) AS centroid_norm
      |  FROM cells GROUP BY 1),
      |dists AS (
      |  SELECT e.label, c.centroid_norm,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list_zip(e.embedding, c.cent),
      |        p -> (CAST(p[1] AS DOUBLE) - p[2])
      |          * (CAST(p[1] AS DOUBLE) - p[2]))),
      |      (a, v) -> a + v)) AS dist
      |  FROM embeddings e JOIN cents c ON e.label = c.label)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  MIN(centroid_norm) AS centroid_norm,
      |  CAST(CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS VARCHAR)
      |      AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS avg_dist,
      |  MAX(dist) AS max_dist
      |FROM dists GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A21 — OHLC bars (open/high/low/close per user-day): the canonical
  // downsampling of an event stream to period bars. First/last are
  // row_number picks under a TOTAL order (ts, then event_id) — not
  // first()/min_by(), whose tie behavior is engine- and partition-
  // arbitrary. Both windows ride the same (user, day) shuffle; min/max
  // of doubles are exact.
  // ---------------------------------------------------------------------
  private def a21(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
    val asc = Window.partitionBy("user_id", "day")
      .orderBy(col("ts"), col("event_id"))
    val desc_ = Window.partitionBy("user_id", "day")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rna", row_number().over(asc))
      .withColumn("rnd", row_number().over(desc_))
      .groupBy(col("user_id"), col("day"))
      .agg(min(when(col("rna") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        min(when(col("rnd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "day")
  }
  private val a21Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |      ORDER BY ts, event_id) AS rna,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |      ORDER BY ts DESC, event_id DESC) AS rnd
      |  FROM events)
      |SELECT user_id, day,
      |  MIN(CASE WHEN rna = 1 THEN value END) AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  MIN(CASE WHEN rnd = 1 THEN value END) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // X40 — quality-aware dedup survivorship: within each near-identical
  // cluster (same canonical fingerprint — whitespace/case-insensitive),
  // keep the RICHEST copy (longest raw text) instead of x01's min-id
  // convention, and report what the swap saves. Survivor choice is a
  // row_number under a total order (n_chars DESC, doc_id ASC) riding
  // the one fingerprint-keyed shuffle. The corpus has no whole-doc
  // duplicates, so (same convention as x02/x10) every 10th doc gets a
  // planted case/whitespace variant — canonically identical, longer
  // raw form — giving the operator real clusters at every scale.
  // ---------------------------------------------------------------------
  private def x40(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("  "),
          upper(regexp_replace(col("text"), " ", "  "))).as("text"))
    val docs = base.unionByName(variants)
      .select(col("doc_id"), length(col("text")).cast("long")
          .as("n_chars"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("fp"))
    val w = Window.partitionBy("fp")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_members"),
        min(when(col("rn") === 1, col("doc_id"))).as("survivor_doc"),
        min(when(col("rn") === 1, col("n_chars"))).as("survivor_chars"),
        (sum(col("n_chars")) -
          min(when(col("rn") === 1, col("n_chars"))))
          .as("chars_saved"))
      .filter(col("n_members") >= 2)
      .orderBy("fp")
  }
  private val x40Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, '  ' ||
      |    upper(regexp_replace(text, ' ', '  ', 'g'))
      |  FROM documents WHERE doc_id % 10 = 0),
      |d AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |    ROW_NUMBER() OVER (PARTITION BY
      |      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |      ORDER BY length(text) DESC, doc_id) AS rn
      |  FROM corpus)
      |SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc,
      |  MIN(CASE WHEN rn = 1 THEN n_chars END) AS survivor_chars,
      |  CAST(SUM(n_chars) - MIN(CASE WHEN rn = 1 THEN n_chars END)
      |    AS BIGINT) AS chars_saved
      |FROM d GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A22 — event-transition matrix (first-order Markov): how users move
  // between event types, as counts and row-normalized probabilities —
  // the product-analytics "path" primitive behind funnel discovery.
  // One per-user lead window on the (ts, event_id) total order, one
  // keyed agg to the bounded type×type grid, probabilities as exact
  // divisions window-summed over that grid.
  // ---------------------------------------------------------------------
  private def a22(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"),
      col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(wFrom).cast("double"))
      .orderBy("from_type", "to_type")
  }
  private val a22Sql =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) /
      |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM c ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // X41 — train/eval split leakage audit: after a deterministic 90/10
  // hash split, which near-duplicate clusters STRADDLE the boundary?
  // Any crossing cluster leaks training content into eval — the
  // contamination mode a random split always has and x14-style
  // decontamination exists to catch. Same planted-variant corpus as
  // x40 (the raw corpus has no whole-doc dups); the split gate is the
  // x13/x36 integer-hash discipline, the cluster tally one keyed agg.
  // ---------------------------------------------------------------------
  private def x41(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("  "),
          upper(regexp_replace(col("text"), " ", "  "))).as("text"))
    val corpus = base.unionByName(variants)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("fp"))
      // split on the hash's HIGH bits (div 2^16 before mod 10): the
      // Knuth constant is ≡1 mod 10, so a bare %10 of the product
      // cycles with doc_id and never mixes
      .withColumn("in_train",
        pmod(expr("((doc_id % 2147483648) * 2654435761 + 17) " +
          "div 65536"), lit(10L)) < 9)
    corpus.groupBy(col("fp"))
      .agg(sum(when(col("in_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("in_train"), 1L).otherwise(0L)).as("n_eval"))
      .filter(col("n_train") > 0 && col("n_eval") > 0)
      .orderBy("fp")
  }
  private val x41Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, '  ' ||
      |    upper(regexp_replace(text, ' ', '  ', 'g'))
      |  FROM documents WHERE doc_id % 10 = 0),
      |g AS (
      |  SELECT
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |    (((doc_id % 2147483648) * 2654435761 + 17) // 65536) % 10 < 9
      |      AS in_train
      |  FROM corpus)
      |SELECT fp,
      |  CAST(SUM(CASE WHEN in_train THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_train,
      |  CAST(SUM(CASE WHEN in_train THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_eval
      |FROM g GROUP BY 1
      |HAVING SUM(CASE WHEN in_train THEN 1 ELSE 0 END) > 0
      |  AND SUM(CASE WHEN in_train THEN 0 ELSE 1 END) > 0
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A23 — per-user activity trend: least-squares slope/intercept of
  // daily event count over the day index. Because BOTH regressors are
  // integers (epoch day, daily count), every moment sum and the
  // numerator/denominator are EXACT 64-bit arithmetic — identical in
  // any engine at any parallelism — and only the final two divisions
  // are floating point. The q35 correlation discipline, degenerated to
  // the all-integer case where no decimal is even needed. Bounds: the
  // products stay inside int64 out to ~10⁵ daily events over a
  // century; past that, lift the moments to DECIMAL(38,0) unchanged.
  // ---------------------------------------------------------------------
  private def a23(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("c"))
    val m = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
        sum(col("c")).as("sy"),
        sum(col("day") * col("c")).as("sxy"),
        sum(col("day") * col("day")).as("sxx"))
      .filter(col("n") >= 2)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.select(col("user_id"), col("n").as("n_days"),
        col("sy").as("n_events"),
        (num.cast("double") / den.cast("double")).as("slope"),
        ((col("sy").cast("double") -
          (num.cast("double") / den.cast("double")) *
            col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"))
      .orderBy("user_id")
  }
  private val a23Sql =
    """WITH daily AS (
      |  SELECT user_id, (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(day) AS BIGINT) AS sx,
      |    CAST(SUM(c) AS BIGINT) AS sy,
      |    CAST(SUM(day * c) AS BIGINT) AS sxy,
      |    CAST(SUM(day * day) AS BIGINT) AS sxx
      |  FROM daily GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT user_id, n AS n_days, sy AS n_events,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
      |FROM m ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // A24 — path-pattern audit: each user's full event-type sequence
  // (total order: ts, event_id) reduced to a fingerprint + pattern
  // flags — "did view eventually lead to purchase" as an ordered
  // SUBSEQUENCE test, which set-based funnels (q18) can't express.
  // The sequence assembles deterministically via array_sort of
  // (ts, event_id, type) structs; LIKE has identical semantics in
  // both engines (no regex dialect risk). Output carries md5(path),
  // not the path — value-checkable without shipping megabyte strings.
  // ---------------------------------------------------------------------
  private def a24(s: SparkSession, d: String): DataFrame = {
    val paths = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .groupBy(col("user_id"))
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("ts"),
          col("event_id"), col("event_type")))),
          sCol => sCol.getField("event_type"))).as("path"))
    paths.select(col("user_id"),
        (size(split(col("path"), ">", -1))).cast("long").as("n_events"),
        md5(col("path")).as("path_md5"),
        col("path").like("%view%purchase%").as("view_then_purchase"),
        col("path").like("%error%error%error%").as("triple_error"))
      .orderBy("user_id")
  }
  private val a24Sql =
    """WITH p AS (
      |  SELECT user_id,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM events GROUP BY 1)
      |SELECT user_id,
      |  CAST(len(string_split(path, '>')) AS BIGINT) AS n_events,
      |  md5(path) AS path_md5,
      |  path LIKE '%view%purchase%' AS view_then_purchase,
      |  path LIKE '%error%error%error%' AS triple_error
      |FROM p ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // Q38 — HLL sketch ROLLUP: distinct users per month computed by
  // merging per-day sketches (datasketches HLL, fixed-size state) —
  // the two-level pattern that makes distinct-count dashboards
  // feasible at 100 TB: day sketches persist once, every coarser grain
  // is a cheap register-max merge, raw data never re-scanned. Driver
  // check is rows-only (sketch internals are engine-specific);
  // SketchRollupSpec proves merged == direct == within 5% of exact.
  // ---------------------------------------------------------------------
  private def q38(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      date_trunc("month", col("ts")).as("month"),
      to_date(col("ts")).as("day"), col("user_id"))
    ev.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("est_distinct_users"))
      .orderBy("month")
  }

  // ---------------------------------------------------------------------
  // Q38b — q38's error contract as a driver-gate row (q26c pattern):
  // the day-sketch→month-merge estimate must land within 5% of the
  // exact per-month distinct; the oracle asserts TRUE per month, so a
  // sketch-merge regression turns the gate red instead of hiding
  // behind "rows-only by design".
  // ---------------------------------------------------------------------
  private def q38b(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      date_trunc("month", col("ts")).as("month"),
      to_date(col("ts")).as("day"), col("user_id"))
    val est = ev.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact_distinct_users"))
    est.join(exact, Seq("month"))
      .select(col("month"), col("n_days"), col("exact_distinct_users"),
        (abs(col("est") - col("exact_distinct_users")).cast("double") <=
          col("exact_distinct_users").cast("double") * 0.05)
          .as("within_bound"))
      .orderBy("month")
  }
  private val q38bSql =
    """SELECT date_trunc('month', ts) AS month,
      |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
      |  TRUE AS within_bound
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A25 — incremental rollup maintenance: the report stays current by
  // merging the NEW batch's partial aggregate into the existing one —
  // no full recompute. Count/decimal-sum are a commutative monoid, so
  // partial(old) ⊕ partial(new) ≡ direct(all); the ORACLE is the
  // direct full rollup, making the merge algebra itself the thing the
  // gate verifies. Split = day parity (stand-in for "yesterday's
  // corpus" vs "today's delta").
  // ---------------------------------------------------------------------
  private def a25(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"),
      col("event_type"), col("value"),
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        % 2 === 0).as("existing"))
    def partial(df: DataFrame) = df
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).as("dtotal"))
    val merged = partial(ev.filter(col("existing")))
      .unionByName(partial(ev.filter(!col("existing"))))
    merged.groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("dtotal")).cast("double").as("total_value"))
      .orderBy("day", "event_type")
  }
  private val a25Sql =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
      |    AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // ST8 — lateness profile: how out-of-order does each event type
  // arrive? lateness = (max event time seen so far in arrival order,
  // per user) − own event time. THE number that sizes a watermark
  // delay: pick a delay above the observed tail or drop data. Arrival
  // order is the ingest id; the running max rides the per-user window
  // (never a global sort); all arithmetic is exact integer µs. The p95
  // runs on the q15 histogram path — (type, late_us)→count, cumulative
  // counts, rank-pick + the repo-pinned lo + (hi − lo)·frac formula
  // replicated verbatim in the oracle — so no engine-built-in
  // interpolation-order divergence can enter, and no per-group value
  // buffer exists (n / n_late / max ride the same histogram).
  // ---------------------------------------------------------------------
  private def st08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val lat = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("late_us",
        greatest(max(col("tus")).over(w) - col("tus"), lit(0L)))
    val hist = lat.groupBy(col("event_type"), col("late_us"))
      .agg(count(lit(1)).as("c"))
      .cut(false)
    Relational.histCum(hist, "event_type", "late_us")
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("late_us") > 0, col("c")).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        Relational.histPct(0.95, "late_us").as("p95_late_us"))
      .orderBy("event_type")
  }
  private val st08Sql =
    s"""WITH lat AS (
       |  SELECT event_type,
       |    GREATEST(MAX(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |      CURRENT ROW) - epoch_us(ts), 0) AS late_us
       |  FROM events),
       |hist AS (
       |  SELECT event_type, late_us, COUNT(*) AS c
       |  FROM lat GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, late_us, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY late_us)
       |      AS cum_hi,
       |    CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE) AS nn
       |  FROM hist)
       |SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN late_us > 0 THEN c ELSE 0 END) AS BIGINT)
       |    AS n_late,
       |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
       |  ${Relational.sqlHistPct("0.95", "late_us")} AS p95_late_us
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // ST9 — Page's CUSUM drift monitor (batch form): the online twin of
  // q52's offline argmax changepoint, and the batch reference for
  // [[graft.streaming.Changepoint]] (flatMapGroupsWithState with four
  // integers of state per key). The one-sided statistics come from
  // the prefix identity S⁺ = P − min(0, running-min P),
  // S⁻ = max(0, running-max P) − P over the deviation prefix sum
  // P = Σ(10⁶·c − ref_ppm) — two window passes over the contracted
  // |types|×|days| relation, all exact ppm integers (the LEAST/
  // GREATEST-with-0 terms include the empty prefix P₀ = 0, matching
  // the streaming state's zero init). Self-calibrated here: ref_ppm
  // is the per-type series mean — the deploy shape attaches it from
  // an offline calibration table instead. Alarm = either side beyond
  // 3·ref_ppm (three average days of cumulative excess/deficit).
  // ---------------------------------------------------------------------
  private def st09(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy("event_type")
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("c_sum", sum(col("c")).over(wAll))
      .withColumn("c_n", count(lit(1)).over(wAll))
      .withColumn("ref_ppm", expr("(1000000L * c_sum) div c_n"))
      .withColumn("p",
        sum(lit(1000000L) * col("c") - col("ref_ppm")).over(wOrd))
      .withColumn("s_pos", col("p") - least(lit(0L), min(col("p")).over(wOrd)))
      .withColumn("s_neg", greatest(lit(0L), max(col("p")).over(wOrd)) - col("p"))
      .withColumn("alarm",
        (col("s_pos") > lit(3L) * col("ref_ppm")) ||
        (col("s_neg") > lit(3L) * col("ref_ppm")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        first(col("ref_ppm")).as("ref_ppm"),
        max(col("s_pos")).as("max_s_pos"),
        max(col("s_neg")).as("max_s_neg"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("alarm"), col("day"))).as("first_alarm_day"))
      .orderBy("event_type")
  }
  private val st09Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, (1000000 * CAST(SUM(c) OVER w AS BIGINT))
      |      // CAST(COUNT(*) OVER w AS BIGINT) AS ref_ppm
      |  FROM daily WINDOW w AS (PARTITION BY event_type)),
      |p AS (
      |  SELECT *, CAST(SUM(1000000 * c - ref_ppm) OVER wo AS BIGINT)
      |      AS p
      |  FROM r WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
      |sc AS (
      |  SELECT *,
      |    p - LEAST(CAST(0 AS BIGINT), CAST(MIN(p) OVER wo AS BIGINT))
      |      AS s_pos,
      |    GREATEST(CAST(0 AS BIGINT), CAST(MAX(p) OVER wo AS BIGINT)) - p
      |      AS s_neg
      |  FROM p WINDOW wo AS (PARTITION BY event_type ORDER BY day))
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(MIN(ref_ppm) AS BIGINT) AS ref_ppm,
      |  CAST(MAX(s_pos) AS BIGINT) AS max_s_pos,
      |  CAST(MAX(s_neg) AS BIGINT) AS max_s_neg,
      |  CAST(SUM(CASE WHEN s_pos > 3 * ref_ppm OR s_neg > 3 * ref_ppm
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
      |  MIN(CASE WHEN s_pos > 3 * ref_ppm OR s_neg > 3 * ref_ppm
      |    THEN day END) AS first_alarm_day
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A26 — audience overlap matrix: for every pair of event types, the
  // exact user-set intersection and Jaccard — the "who does A also do
  // B" segmentation primitive. Contract to the DISTINCT (type, user)
  // grain first (one keyed agg), self-join ON user_id (keyed, never
  // cross), count per ordered type pair over the bounded type grid.
  // Set sizes ride in via the same contracted relation. At 100 TB the
  // KMV/HLL sketches (BottomKSketch, q38) are the swap-in when even
  // the distinct grain is too hot — this is the exact form.
  // ---------------------------------------------------------------------
  private def a26(s: SparkSession, d: String): DataFrame = {
    val tu = Tables.events(s, d)
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = tu.as("a")
      .join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a")), "type_a")
      .join(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b")), "type_b")
      .withColumn("jaccard", col("n_both").cast("double") /
        (col("n_a") + col("n_b") - col("n_both")).cast("double"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("jaccard"))
      .orderBy("type_a", "type_b")
  }
  private val a26Sql =
    """WITH tu AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |sizes AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tu GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM tu a JOIN tu b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
      |  CAST(n_both AS DOUBLE) /
      |    CAST(sa.n + sb.n - n_both AS DOUBLE) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON type_a = sa.event_type
      |JOIN sizes sb ON type_b = sb.event_type
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // A27 — ratio-to-report: each (year, status) cell's revenue share of
  // its year and of the grand total — the percent-of-parent column
  // every BI rollup carries. Shares divide EXACT DECIMAL window sums
  // (a double window sum would be frame-order-dependent); the oracle
  // converts decimals to double via VARCHAR (the >2^53 rule).
  // ---------------------------------------------------------------------
  private def a27(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,6)")).as("dtotal"))
    val wY = Window.partitionBy("order_year")
    val wAll = Window.partitionBy()
    cells.select(col("order_year"), col("o_orderstatus"), col("n"),
        col("dtotal").cast("double").as("total"),
        (col("dtotal").cast("double") /
          sum(col("dtotal")).over(wY).cast("double"))
          .as("share_of_year"),
        (col("dtotal").cast("double") /
          sum(col("dtotal")).over(wAll).cast("double"))
          .as("share_of_total"))
      .orderBy("order_year", "o_orderstatus")
  }
  private val a27Sql =
    """WITH cells AS (
      |  SELECT EXTRACT(year FROM o_orderdate) AS order_year,
      |    o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS dtotal
      |  FROM orders GROUP BY 1, 2)
      |SELECT order_year, o_orderstatus, n,
      |  CAST(CAST(dtotal AS VARCHAR) AS DOUBLE) AS total,
      |  CAST(CAST(dtotal AS VARCHAR) AS DOUBLE) /
      |    CAST(CAST(SUM(dtotal) OVER (PARTITION BY order_year)
      |      AS VARCHAR) AS DOUBLE) AS share_of_year,
      |  CAST(CAST(dtotal AS VARCHAR) AS DOUBLE) /
      |    CAST(CAST(SUM(dtotal) OVER () AS VARCHAR) AS DOUBLE)
      |    AS share_of_total
      |FROM cells ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // Q39 — data-quality TREND: q03's FK-orphan check lifted to a
  // monthly series (orphan rate of orders→customer per order month) —
  // the dashboard form that shows WHEN integrity regressed, not just
  // that it did. Left join against the key-only dim projection; rate
  // is an exact division of exact counts.
  // ---------------------------------------------------------------------
  private def q39(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.customer(s, d)
      .select(col("c_custkey")).distinct()
      .withColumn("present", lit(1))
    Tables.orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_custkey"))
      .join(keys, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("present").isNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .withColumn("orphan_rate", col("n_orphans").cast("double") /
        col("n_orders").cast("double"))
      .orderBy("month")
  }
  private val q39Sql =
    """WITH k AS (SELECT DISTINCT c_custkey, 1 AS present
      |  FROM customer)
      |SELECT date_trunc('month', o_orderdate) AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN present IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_orphans,
      |  CAST(SUM(CASE WHEN present IS NULL THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS orphan_rate
      |FROM orders LEFT JOIN k ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q40 — the TPC-H Q1 pricing summary over this schema: the canonical
  // scan→filter→wide-agg report (8 aggregates, 2 grouping keys, one
  // partial-agg shuffle over a handful of groups). All money math in
  // exact decimal with precisions chosen so no product overflows
  // either engine's 38-digit ceiling: DECIMAL(12,2)×DECIMAL(5,2) →
  // (18,4), ×(5,2) → (24,6); sums stay exact, averages are one
  // division each, decimals leave via the VARCHAR route.
  // ---------------------------------------------------------------------
  private def q40(s: SparkSession, d: String): DataFrame = {
    val p = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax = col("l_tax").cast("decimal(4,2)")
    val q = col("l_quantity").cast("decimal(12,2)")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(q).cast("double").as("sum_qty"),
        sum(p).cast("double").as("sum_base_price"),
        sum(p * (lit(1).cast("decimal(3,2)") - disc)).cast("double")
          .as("sum_disc_price"),
        sum(p * (lit(1).cast("decimal(3,2)") - disc) *
          (lit(1).cast("decimal(3,2)") + tax)).cast("double")
          .as("sum_charge"),
        (sum(q).cast("double") / count(lit(1)).cast("double"))
          .as("avg_qty"),
        (sum(p).cast("double") / count(lit(1)).cast("double"))
          .as("avg_price"),
        (sum(disc).cast("double") / count(lit(1)).cast("double"))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
  private val q40Sql =
    """WITH t AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS q,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
      |    CAST(l_discount AS DECIMAL(4,2)) AS disc,
      |    CAST(l_tax AS DECIMAL(4,2)) AS tax
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
      |m AS (
      |  SELECT l_returnflag, l_linestatus,
      |    SUM(q) AS sq, SUM(p) AS sp,
      |    SUM(p * (CAST(1 AS DECIMAL(3,2)) - disc)) AS sdp,
      |    SUM(p * (CAST(1 AS DECIMAL(3,2)) - disc)
      |      * (CAST(1 AS DECIMAL(3,2)) + tax)) AS sc,
      |    SUM(disc) AS sd, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM t GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sq AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sp AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sdp AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sc AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sq AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS avg_qty,
      |  CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS avg_price,
      |  CAST(CAST(sd AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS avg_disc,
      |  n AS count_order
      |FROM m ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // Q41 — shipping-priority top-K (TPC-H Q3 shape): the canonical
  // selective 3-way join → revenue agg → top-10. Filters push to all
  // three scans before the keyed joins (customer is sf-growing: no
  // broadcast hint, AQE decides); revenue sums exact decimal, and the
  // top-10 is a TakeOrdered over bit-identical doubles with a key
  // tiebreak, so both engines pick the same rows.
  // ---------------------------------------------------------------------
  private def q41(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp")
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate",
        "o_orderpriority")
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") -
            col("l_discount").cast("decimal(4,2)"))).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }
  private val q41Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(3,2))
      |      - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR)
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // Q42 — market-basket affinity: part pairs co-purchased in the same
  // order, with support and lift — the "frequently bought together"
  // primitive. The pair join is keyed ON the order (pairs per order =
  // items-choose-2, bounded by basket size, never corpus²), the part
  // marginals come from one keyed agg, and lift is exact counts through
  // exactly-rounded IEEE division. Deterministic top-50 by (lift,
  // pair key) with a support floor.
  // ---------------------------------------------------------------------
  private def q42(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val no = Tables.orders(s, d)
      .agg(countDistinct(col("o_orderkey")).as("n_orders"))
    val partN = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_part"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 3)
    pairs
      .join(partN.select(col("l_partkey").as("part_a"),
        col("n_part").as("n_a")), "part_a")
      .join(partN.select(col("l_partkey").as("part_b"),
        col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(no)) // 1-row scalar, a17's pattern
      .withColumn("lift",
        col("n_both").cast("double") * col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
        col("n_b"), col("lift"))
      .orderBy(desc("lift"), col("part_a"), col("part_b"))
      .limit(50)
  }
  private val q42Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |no AS (SELECT COUNT(DISTINCT o_orderkey) AS n_orders
      |  FROM orders),
      |pn AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
      |  FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT part_a, part_b, n_both, pa.n_part AS n_a,
      |  pb.n_part AS n_b,
      |  CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE)
      |    / (CAST(pa.n_part AS DOUBLE) * CAST(pb.n_part AS DOUBLE))
      |    AS lift
      |FROM pairs
      |JOIN pn pa ON part_a = pa.l_partkey
      |JOIN pn pb ON part_b = pb.l_partkey
      |CROSS JOIN no
      |ORDER BY lift DESC, part_a, part_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // A28 — bounce rate by day: gap-sessionize (st02's 1800 s rule),
  // then the fraction of single-event sessions per session-start day —
  // the engagement-quality KPI over the sessionizer. Two keyed
  // shuffles (per-user window, then day agg); all µs arithmetic exact.
  // ---------------------------------------------------------------------
  private def a28(s: SparkSession, d: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tus")
    val run = Window.partitionBy("user_id").orderBy("tus")
      .rowsBetween(Window.unboundedPreceding, 0)
    val sessions = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("is_new",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), min(col("tus")).as("start_us"))
    sessions
      .groupBy(to_date(timestamp_micros(col("start_us"))).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .as("n_bounces"))
      .withColumn("bounce_rate", col("n_bounces").cast("double") /
        col("n_sessions").cast("double"))
      .orderBy("day")
  }
  private val a28Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tus FROM events),
      |m AS (
      |  SELECT user_id, tus,
      |    CASE WHEN lag(tus) OVER w IS NULL
      |           OR tus - lag(tus) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      |s AS (
      |  SELECT user_id,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_idx, tus
      |  FROM m),
      |g AS (
      |  SELECT user_id, session_idx, COUNT(*) AS n_events,
      |    MIN(tus) AS start_us
      |  FROM s GROUP BY 1, 2)
      |SELECT CAST(make_timestamp(start_us) AS DATE) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounces,
      |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q43 — segment momentum: month-over-month revenue change and rank
  // movement per market segment — the period-comparison report (lag
  // along time within segment, rank within month across segments).
  // Totals are exact decimal; the MoM delta is ONE subtraction of
  // identically-derived doubles; ranks order bit-identical doubles
  // with a segment tiebreak.
  // ---------------------------------------------------------------------
  private def q43(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(28,6)")).as("dtotal"))
      .withColumn("total", col("dtotal").cast("double"))
    val wSeg = Window.partitionBy("c_mktsegment").orderBy("month")
    val wMon = Window.partitionBy("month")
      .orderBy(desc("total"), col("c_mktsegment"))
    rev
      .withColumn("prev_total", lag(col("total"), 1).over(wSeg))
      .withColumn("mom_change", col("total") - col("prev_total"))
      .withColumn("rank_in_month", row_number().over(wMon))
      .select(col("month"), col("c_mktsegment"), col("total"),
        col("prev_total"), col("mom_change"), col("rank_in_month"))
      .orderBy("month", "c_mktsegment")
  }
  private val q43Sql =
    """WITH rev AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |    c_mktsegment,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
      |      AS VARCHAR) AS DOUBLE) AS total
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT month, c_mktsegment, total,
      |  lag(total) OVER (PARTITION BY c_mktsegment ORDER BY month)
      |    AS prev_total,
      |  total - lag(total) OVER (PARTITION BY c_mktsegment
      |    ORDER BY month) AS mom_change,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY month
      |    ORDER BY total DESC, c_mktsegment) AS INTEGER)
      |    AS rank_in_month
      |FROM rev ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // J16 — aggregate-BELOW-join rewrite: revenue by order priority with
  // lineitem pre-aggregated to order grain BEFORE the join, so the
  // join is 1:1 instead of 1:N — the fact side shuffles order-grain
  // partials, not raw line items. The ORACLE is deliberately the naive
  // join-then-aggregate form, so the correctness gate itself proves
  // the rewrite value-exact (exact decimal sums are associative — the
  // regroup can't change them). At 100 TB this rewrite is the
  // difference between shuffling 600 B rows and 150 B partials.
  // ---------------------------------------------------------------------
  private def j16(s: SparkSession, d: String): DataFrame = {
    val lrev = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(28,6)"))
        .as("drev"))
    Tables.orders(s, d)
      .join(lrev, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("drev")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }
  private val j16Sql =
    """SELECT o_orderpriority,
      |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
      |    AS VARCHAR) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // A29 — daily percentile bands: p50/p90/p99 of the event value per
  // day — the monitoring chart behind every latency/metric dashboard.
  // The interpolation formula is pinned EXPLICITLY on both sides
  // (rank-pick via row_number, then lo + (hi − lo)·frac): built-in
  // interpolated percentiles use different operation orders across
  // engines (lo+(hi−lo)f vs lo(1−f)+hi·f), which diverge in the last
  // ulp at non-dyadic fractions like 0.99 — measured at sf1 before
  // this was pinned. One keyed shuffle; the rank window rides it.
  // ---------------------------------------------------------------------
  private def a29(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("day").orderBy("value")
    val wAll = Window.partitionBy("day")
    val ranked = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(wAll))
    def pct(p: Double, name: String) = {
      val k = (col("nn") - 1).cast("double") * lit(p)
      val loIdx = floor(k).cast("long") + 1
      val frac = k - floor(k)
      val lo = min(when(col("rn") === loIdx, col("value")))
      val hi = coalesce(min(when(col("rn") === loIdx + 1, col("value"))),
        min(when(col("rn") === loIdx, col("value"))))
      (lo + (hi - lo) * min(frac)).as(name)
    }
    ranked.groupBy(col("day"))
      .agg(count(lit(1)).as("n"), pct(0.5, "p50"), pct(0.9, "p90"),
        pct(0.99, "p99"))
      .orderBy("day")
  }
  private val a29Sql = {
    def pct(p: String, name: String) =
      s"""MIN(CASE WHEN rn = FLOOR((nn - 1) * $p) + 1 THEN value END)
         |  + (COALESCE(
         |      MIN(CASE WHEN rn = FLOOR((nn - 1) * $p) + 2 THEN value
         |        END),
         |      MIN(CASE WHEN rn = FLOOR((nn - 1) * $p) + 1 THEN value
         |        END))
         |    - MIN(CASE WHEN rn = FLOOR((nn - 1) * $p) + 1 THEN value
         |        END))
         |    * MIN((nn - 1) * $p - FLOOR((nn - 1) * $p)) AS $name"""
        .stripMargin
    s"""WITH ranked AS (
       |  SELECT CAST(ts AS DATE) AS day, value,
       |    ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
       |      ORDER BY value) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY CAST(ts AS DATE))
       |      AS DOUBLE) AS nn
       |  FROM events)
       |SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${pct("0.5", "p50")},
       |  ${pct("0.9", "p90")},
       |  ${pct("0.99", "p99")}
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Q44 — repeat-transaction audit: customers placing MULTIPLE orders
  // the same day — the finance-style double-charge screen (exact
  // amount equality never fires on organic data; same-actor-same-day
  // is the screen that does). One keyed agg to the candidate grain;
  // witnesses ride along as min/max keys and the amount spread.
  // ---------------------------------------------------------------------
  private def q44(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy(col("o_custkey"),
        to_date(col("o_orderdate")).as("order_day"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .filter(col("n_orders") > 1)
      .orderBy("o_custkey", "order_day")
  }
  private val q44Sql =
    """SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1, 2 HAVING COUNT(*) > 1
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // A30 — inter-event gap statistics: per event type, how far apart
  // are a user's consecutive events of that type? The distribution
  // behind session-gap and watermark choices (complements st08's
  // arrival lateness and a28's bounce rate). Gaps are exact integer
  // µs from a (user, type)-keyed window; stats are min/max/exact-
  // division mean — no float accumulation.
  // ---------------------------------------------------------------------
  private def a30(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("tus"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        (sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double")).as("avg_gap_us"))
      .orderBy("event_type")
  }
  private val a30Sql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |      AS gap_us
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
      |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
      |  CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS avg_gap_us
      |FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // X43 — shard-assignment balance audit: docs hashed into N training
  // shards (the write-side partitioner of x17/x26's pipeline), with
  // per-shard doc/token tallies and each shard's load factor vs the
  // even split — the check that catches a bad partitioning BEFORE a
  // straggler shard serializes the training run. High-bit hash gate
  // (the x41 rule: the Knuth constant is ≡1 mod small n), exact
  // counts, one exactly-rounded division for the load factor.
  // ---------------------------------------------------------------------
  private val NumShards = 16L

  private def x43(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard",
        pmod(expr("((doc_id % 2147483648) * 2654435761 + 23) " +
          s"div 65536"), lit(NumShards)))
    val wAll = Window.partitionBy()
    docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("token_load_factor",
        col("n_tokens").cast("double") * lit(NumShards).cast("double") /
          sum(col("n_tokens")).over(wAll).cast("double"))
      .orderBy("shard")
  }
  private val x43Sql =
    s"""WITH t AS (
       |  SELECT (((doc_id % 2147483648) * 2654435761 + 23) // 65536)
       |      % $NumShards AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    n_chars
       |  FROM documents),
       |g AS (
       |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |  FROM t GROUP BY 1)
       |SELECT shard, n_docs, n_tokens, n_chars,
       |  CAST(n_tokens AS DOUBLE) * $NumShards
       |    / CAST(SUM(n_tokens) OVER () AS DOUBLE)
       |    AS token_load_factor
       |FROM g ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q56-ext — funnel conversion (view → click → purchase): the product-
  // analytics staple — of the users who viewed, how many clicked within
  // 24 h of their FIRST view, and of those, how many purchased within
  // 24 h of that first qualifying click. Step times are first-match
  // semantics (min event time past the previous step's timestamp,
  // within the window), so the whole funnel is three keyed min-aggs —
  // no per-user sequence scan, no window function, and each step's
  // relation SHRINKS (converters only). Latencies and conversion rates
  // are exact integers (epoch µs sums, ppm integral division). One
  // summary row; the three step relations are user-keyed partial aggs
  // — at 100 TB this is three shuffles of at-most-|users| rows.
  // ---------------------------------------------------------------------
  private val FunnelWindowUs = 86400000000L // 24 h

  private def q56(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t0"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t0") &&
        col("us") <= col("t0") + FunnelWindowUs)
      .groupBy("user_id").agg(min("us").as("t1"), min("t0").as("t0"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("t1") &&
        col("us") <= col("t1") + FunnelWindowUs)
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val va = v.agg(count(lit(1)).as("n_view"))
    val ca = c.agg(count(lit(1)).as("n_click"),
      sum(col("t1") - col("t0")).as("lat_c"))
    val pa = p.agg(count(lit(1)).as("n_purchase"),
      sum(col("t2") - col("t1")).as("lat_p"))
    va.crossJoin(ca).crossJoin(pa)
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        expr("1000000L * n_click div n_view").as("click_conv_ppm"),
        expr("1000000L * n_purchase div n_click")
          .as("purchase_conv_ppm"),
        expr("lat_c div n_click").as("avg_click_lat_us"),
        expr("lat_p div n_purchase").as("avg_purchase_lat_us"))
  }
  private val q56Sql =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |v AS (SELECT user_id, MIN(us) AS t0 FROM ev
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (
       |  SELECT e.user_id, MIN(e.us) AS t1, MIN(v.t0) AS t0
       |  FROM ev e JOIN v ON v.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND e.us > v.t0
       |    AND e.us <= v.t0 + $FunnelWindowUs
       |  GROUP BY 1),
       |p AS (
       |  SELECT e.user_id, MIN(e.us) AS t2, MIN(c.t1) AS t1
       |  FROM ev e JOIN c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.us > c.t1
       |    AND e.us <= c.t1 + $FunnelWindowUs
       |  GROUP BY 1),
       |va AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view FROM v),
       |ca AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_click,
       |       CAST(SUM(t1 - t0) AS BIGINT) AS lat_c FROM c),
       |pa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchase,
       |       CAST(SUM(t2 - t1) AS BIGINT) AS lat_p FROM p)
       |SELECT n_view, n_click, n_purchase,
       |  1000000 * n_click // n_view AS click_conv_ppm,
       |  1000000 * n_purchase // n_click AS purchase_conv_ppm,
       |  lat_c // n_click AS avg_click_lat_us,
       |  lat_p // n_purchase AS avg_purchase_lat_us
       |FROM va CROSS JOIN ca CROSS JOIN pa""".stripMargin

  // ---------------------------------------------------------------------
  // Q59-ext — DAU/WAU stickiness: daily active users vs trailing-7-day
  // actives, the engagement ratio every product dashboard carries.
  // The hard part is DISTINCT over a SLIDING window — not expressible
  // as a window function in either engine (no DISTINCT aggregates over
  // frames), and the naive day-grid × events range join plans as a
  // nested loop. The scalable shape: each (day, user) fact is exploded
  // to the 7 window-END days it contributes to (a bounded 7× fan-out
  // of the DEDUPED daily relation, not raw events), then one exact
  // count-distinct per window end — two keyed partial-agg shuffles,
  // zero non-equi joins, linear at any scale. Stickiness is exact ppm.
  // ---------------------------------------------------------------------
  private def q59(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().cut(false) // dau agg + the exploded wau path
    val dau = daily.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = daily
      .select(explode(expr("sequence(day, date_add(day, 6))"))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("1000000L * dau div wau").as("stickiness_ppm"))
      .orderBy("day")
  }
  private val q59Sql =
    """WITH daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      |        FROM daily GROUP BY 1),
      |expl AS (
      |  SELECT DISTINCT day + CAST(k AS INTEGER) AS day, user_id
      |  FROM daily, UNNEST(generate_series(0, 6)) AS t(k)),
      |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
      |        FROM expl GROUP BY 1)
      |SELECT day, dau, wau, 1000000 * dau // wau AS stickiness_ppm
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // Q62-ext — DAU/MAU stickiness: q59's sliding-distinct rewrite
  // generalized to the trailing-28-day window (the other ratio every
  // growth dashboard carries), registered to PRICE the rewrite's one
  // scale knob: the explode fan-out is W× the DEDUPED (day, user)
  // grain, so cost is linear in the window length W — measured at
  // bench scale (sf0.1, steady state, r9): q59 (W=7) 0.63 s vs q62
  // (W=28) 0.65 s, because at this user-day density the shared event
  // scan + (day, user) dedup dominate and the W×|daily| explode is
  // noise next to them; the exploded relation stays the deduped DAILY
  // grain × 28, far below the raw event grain.
  // CROSSOVER: the exploded relation is W·|daily| rows — when W grows
  // past ~100 (quarterly/annual actives) or daily density approaches
  // one row per user-day at 100 TB, the right swap-in is a mergeable
  // distinct sketch per day (KMV bottom-k or HLL) union-folded over
  // the window — O(|days|·k) state instead of W·|daily| — certified
  // against this exact form via q26c's error-contract pattern (sketch
  // row + exact twin + bound check as first-class columns).
  // ---------------------------------------------------------------------
  private def q62(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().cut(false) // dau agg + the exploded mau path
    val dau = daily.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = daily
      .select(explode(expr("sequence(day, date_add(day, 27))"))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        expr("1000000L * dau div mau").as("stickiness_ppm"))
      .orderBy("day")
  }
  private val q62Sql =
    """WITH daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      |        FROM daily GROUP BY 1),
      |expl AS (
      |  SELECT DISTINCT day + CAST(k AS INTEGER) AS day, user_id
      |  FROM daily, UNNEST(generate_series(0, 27)) AS t(k)),
      |mau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS mau
      |        FROM expl GROUP BY 1)
      |SELECT day, dau, mau, 1000000 * dau // mau AS stickiness_ppm
      |FROM dau JOIN mau USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // X91 — sliding-window KMV distinct: the sketch swap-in q62's card
  // prices, IMPLEMENTED and certified (q26c/x71's error-contract
  // pattern: estimator + exact twin + 2σ bound as first-class
  // columns). Per day, a bottom-k=128 sketch of multiplicative-hashed
  // user ids (one keyed truncation over the deduped daily grain —
  // k longs of state per day, the mergeable summary a 100 TB deploy
  // would checkpoint); the 28-day MAU estimate merges the WINDOW's
  // daily sketches: bottom-k of their union IS bottom-k of the
  // window's full distinct-hash set (the same cap-monotonicity
  // argument as SparseIndex.append — any hash in the window's true
  // bottom-k is in its own day's bottom-k), so the sliding merge adds
  // ZERO approximation over one-shot KMV; the only error is the
  // estimator itself, (k−1)·M div h_(k), against which the exact q62
  // path lands err_ppm and the flat 2σ bound 2·10⁶/√(k−2). Every
  // number is deterministic integer order statistics, so DuckDB
  // reproduces the SKETCH bit-for-bit (x71's certification trick) —
  // the estimator is gated cross-engine, not just the exact twin.
  // Scale: sketch-path cost is O(days · k) past the shared daily
  // dedup — the W·|daily| explode that q62 pays survives here only on
  // the days×k sketch relation, which is the crossover's entire point.
  // ---------------------------------------------------------------------
  // Constants come THROUGH the library object (graft.streaming
  // .SlidingKmv) — a change there changes these SQL twins at compile
  // time, not as a later oracle-gate surprise.
  private val KmvWinK = graft.streaming.SlidingKmv.K
  private val KmvWinM = graft.streaming.SlidingKmv.M
  private val KmvHashA = graft.streaming.SlidingKmv.HashA
  private val KmvHashB = graft.streaming.SlidingKmv.HashB
  private val KmvWinBoundPpm: Long =
    math.ceil(2e6 / math.sqrt((KmvWinK - 2).toDouble)).toLong
  /** Spark-side floored-mod hash, ≡ SlidingKmv.hash for ALL ids
    * (pmod mirrors Math.floorMod; plain % would diverge on negatives). */
  private def kmvHashSpark(c: String): String =
    s"pmod(${KmvHashA}L * pmod($c, ${KmvWinM}L) + ${KmvHashB}L, ${KmvWinM}L)"
  /** DuckDB twin of the same floored-mod hash (DuckDB % follows the
    * dividend sign, so wrap with the ((x%m)+m)%m identity). */
  private def kmvHashDuck(c: String): String =
    s"((($KmvHashA * ((($c % $KmvWinM) + $KmvWinM) % $KmvWinM) + $KmvHashB) % $KmvWinM) + $KmvWinM) % $KmvWinM"

  private def x91(s: SparkSession, d: String): DataFrame = {
    val wDay = Window.partitionBy("day").orderBy("h")
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().cut(false) // sketch path + exact path
    val dh = daily
      .withColumn("h", expr(kmvHashSpark("user_id")))
      .select("day", "h").distinct()
    val daySk = dh
      .withColumn("rk", row_number().over(wDay))
      .filter(col("rk") <= KmvWinK)
      .select("day", "h")
    val winSk = daySk
      .select(explode(expr("sequence(day, date_add(day, 27))"))
        .as("day"), col("h"))
      .distinct()
      .withColumn("rk", row_number().over(wDay))
      .filter(col("rk") <= KmvWinK)
    val est = winSk.groupBy("day")
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_h"))
      .withColumn("mau_est",
        when(col("k_used") < KmvWinK, col("k_used"))
          .otherwise(expr(s"(${KmvWinK - 1}L * ${KmvWinM}L) div kth_h")))
    val exact = daily
      .select(explode(expr("sequence(day, date_add(day, 27))"))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("mau_exact"))
    exact.join(est, "day")
      .withColumn("err_ppm",
        expr("(1000000L * abs(mau_est - mau_exact)) div mau_exact"))
      .withColumn("bound_ppm", lit(KmvWinBoundPpm))
      .withColumn("within_bound",
        (col("err_ppm") <= col("bound_ppm")).cast("long"))
      .select("day", "mau_exact", "k_used", "kth_h", "mau_est",
        "err_ppm", "bound_ppm", "within_bound")
      .orderBy("day")
  }
  private lazy val x91Sql =
    s"""WITH daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dh AS (
      |  SELECT DISTINCT day,
      |    ${kmvHashDuck("user_id")} AS h
      |  FROM daily),
      |daysk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h,
      |      ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rk
      |    FROM dh)
      |  WHERE rk <= $KmvWinK),
      |winsk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h,
      |      ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rk
      |    FROM (
      |      SELECT DISTINCT day + CAST(k AS INTEGER) AS day, h
      |      FROM daysk, UNNEST(generate_series(0, 27)) AS t(k)))
      |  WHERE rk <= $KmvWinK),
      |est AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS k_used,
      |    MAX(h) AS kth_h
      |  FROM winsk GROUP BY 1),
      |est2 AS (
      |  SELECT day, k_used, kth_h,
      |    CASE WHEN k_used < $KmvWinK THEN k_used
      |         ELSE (CAST(${KmvWinK - 1} AS BIGINT) * $KmvWinM)
      |           // kth_h END AS mau_est
      |  FROM est),
      |exact AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS mau_exact FROM (
      |    SELECT DISTINCT day + CAST(k AS INTEGER) AS day, user_id
      |    FROM daily, UNNEST(generate_series(0, 27)) AS t(k))
      |  GROUP BY 1)
      |SELECT x.day, x.mau_exact, e.k_used, e.kth_h, e.mau_est,
      |  (1000000 * ABS(e.mau_est - x.mau_exact)) // x.mau_exact
      |    AS err_ppm,
      |  CAST($KmvWinBoundPpm AS BIGINT) AS bound_ppm,
      |  CAST(CASE WHEN (1000000 * ABS(e.mau_est - x.mau_exact))
      |      // x.mau_exact <= $KmvWinBoundPpm
      |    THEN 1 ELSE 0 END AS BIGINT) AS within_bound
      |FROM exact x JOIN est2 e USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // ST11 — per-day KMV sketch card, the batch twin of
  // [[graft.streaming.SlidingKmv]] (x91's continuous half): per day,
  // the bottom-k=128 sketch summary (k_used, h_(k)), the KMV DAU
  // estimate it implies, and the error contract against the exact
  // daily distinct. The batch relational form and the streaming fold
  // share constants and the estimate formula THROUGH the library
  // object, and SlidingKmvSpec pins stream state ≡ this card's sketch
  // columns bit-for-bit on the real events table — re-delivered
  // events can't move a set-union sketch, so the stream needs no
  // high-water mark to be effectively-once. Scale: one keyed dedup +
  // one per-day truncation window; the card is |days| rows; the
  // sketch it certifies is what the deploy checkpoints (k longs/day)
  // so any trailing window is served without re-scanning events.
  // ---------------------------------------------------------------------
  private def st11(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.SlidingKmv.{K => SkK, M => SkM}
    val wDay = Window.partitionBy("day").orderBy("h")
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().cut(false) // sketch path + exact dau
    val daySk = daily
      .withColumn("h", expr(kmvHashSpark("user_id")))
      .select("day", "h").distinct()
      .withColumn("rk", row_number().over(wDay))
      .filter(col("rk") <= SkK)
    val est = daySk.groupBy("day")
      .agg(count(lit(1)).as("k_used"), max("h").as("kth_h"))
      .withColumn("dau_est",
        when(col("k_used") < SkK, col("k_used"))
          .otherwise(expr(s"(${SkK - 1}L * ${SkM}L) div kth_h")))
    daily.groupBy("day").agg(count(lit(1)).as("dau_exact"))
      .join(est, "day")
      .withColumn("err_ppm",
        expr("(1000000L * abs(dau_est - dau_exact)) div dau_exact"))
      .withColumn("bound_ppm", lit(KmvWinBoundPpm))
      .withColumn("within_bound",
        (col("err_ppm") <= col("bound_ppm")).cast("long"))
      .select("day", "dau_exact", "k_used", "kth_h", "dau_est",
        "err_ppm", "bound_ppm", "within_bound")
      .orderBy("day")
  }
  private lazy val st11Sql =
    s"""WITH daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dh AS (
      |  SELECT DISTINCT day,
      |    ${kmvHashDuck("user_id")} AS h
      |  FROM daily),
      |daysk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h,
      |      ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rk
      |    FROM dh)
      |  WHERE rk <= $KmvWinK),
      |est AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS k_used,
      |    MAX(h) AS kth_h
      |  FROM daysk GROUP BY 1),
      |est2 AS (
      |  SELECT day, k_used, kth_h,
      |    CASE WHEN k_used < $KmvWinK THEN k_used
      |         ELSE (CAST(${KmvWinK - 1} AS BIGINT) * $KmvWinM)
      |           // kth_h END AS dau_est
      |  FROM est),
      |exact AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau_exact
      |  FROM daily GROUP BY 1)
      |SELECT x.day, x.dau_exact, e.k_used, e.kth_h, e.dau_est,
      |  (1000000 * ABS(e.dau_est - x.dau_exact)) // x.dau_exact
      |    AS err_ppm,
      |  CAST($KmvWinBoundPpm AS BIGINT) AS bound_ppm,
      |  CAST(CASE WHEN (1000000 * ABS(e.dau_est - x.dau_exact))
      |      // x.dau_exact <= $KmvWinBoundPpm
      |    THEN 1 ELSE 0 END AS BIGINT) AS within_bound
      |FROM exact x JOIN est2 e USING (day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // Q60-ext — weekly cohort retention triangle: users grouped by their
  // FIRST active week, tracked by distinct-active presence in each
  // later week — the retention curve behind every growth dashboard,
  // and the q59 stickiness ratio unrolled over cohort age. Exact
  // integers throughout: week buckets are date_trunc (Monday-start in
  // both engines), cohort age is day-difference div 7, retention is
  // ppm integral division against the cohort's week-0 size (every
  // user is active in their first week by construction, so week 0 IS
  // the cohort census). Plan: one (user, week) dedup, one per-user
  // min, a keyed join back, one (cohort, age) agg and a broadcast-
  // sized join to attach cohort sizes — all partial-agg'd keyed
  // shuffles, nothing wider than |users| rows.
  // ---------------------------------------------------------------------
  private def q60(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.events(s, d)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct().cut(false) // first-week agg + activity join
    val first = weekly.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val aged = weekly.join(first, "user_id")
      .withColumn("weeks_since",
        expr("datediff(week, cohort_week) div 7"))
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_active"))
    val sizes = aged.filter(col("weeks_since") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    aged.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("weeks_since"), col("n_active"),
        col("cohort_size"),
        expr("1000000L * n_active div cohort_size")
          .as("retention_ppm"))
      .orderBy("cohort_week", "weeks_since")
  }
  private val q60Sql =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |first AS (SELECT user_id, MIN(week) AS cohort_week
      |          FROM weekly GROUP BY 1),
      |aged AS (
      |  SELECT f.cohort_week,
      |    date_diff('day', f.cohort_week, w.week) // 7 AS weeks_since,
      |    CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM weekly w JOIN first f ON f.user_id = w.user_id
      |  GROUP BY 1, 2),
      |sizes AS (SELECT cohort_week, n_active AS cohort_size
      |          FROM aged WHERE weeks_since = 0)
      |SELECT a.cohort_week, a.weeks_since, a.n_active, s.cohort_size,
      |  1000000 * a.n_active // s.cohort_size AS retention_ppm
      |FROM aged a JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, weeks_since""".stripMargin

  // ---------------------------------------------------------------------
  // Q61-ext — seasonal decomposition (STL-lite, exact integers): split
  // each event type's daily volume into TREND (centered 7-day sum) and
  // WEEKDAY SEASONALITY — the decomposition behind "is Monday really
  // our slow day, or is that the trend?", and the exact counterpart of
  // a33's χ² uniformity screen (a33 says WHETHER seasonality exists;
  // this says HOW MUCH, per weekday). Everything stays integer by
  // working at 7× scale: detrended_x7 = 7·c(day) − Σ_{±3 days} c, so
  // no division happens until the final ppm index, and the centered
  // window is gated to FULL, CONTIGUOUS 7-day spans (7 rows AND
  // last−first = 6 days — a ROWS frame over gapped days would silently
  // mix weeks). Seasonal index per (type, weekday): 1e6·Σ detrended_x7
  // div (7·Σ c) over that weekday's qualifying days — positive = above
  // trend. Weekday is the pinned Monday-0 convention (T12/a33).
  // Plan: one (type, day) agg, one per-type ordered window, one
  // (type, weekday) contracting agg — nothing wider than days×types.
  // ---------------------------------------------------------------------
  private def q61(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val wC = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("t7", sum("c").over(wC))
      .withColumn("n7", count(lit(1)).over(wC))
      .withColumn("d0", min("day").over(wC))
      .withColumn("d6", max("day").over(wC))
      .filter(col("n7") === 7 && expr("datediff(d6, d0) = 6"))
      .withColumn("det7", lit(7L) * col("c") - col("t7"))
      .withColumn("dow", ((dayofweek(col("day")) + 5) % 7).cast("long"))
    det.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum("c").as("sum_c"),
        sum("det7").as("sum_det7"))
      .withColumn("seasonal_ppm",
        expr("(1000000L * sum_det7) div (7L * sum_c)"))
      .orderBy("event_type", "dow")
  }
  private val q61Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |det AS (
      |  SELECT event_type, day, c,
      |    SUM(c) OVER w AS t7,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n7,
      |    MIN(day) OVER w AS d0, MAX(day) OVER w AS d6
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |kept AS (
      |  SELECT event_type, isodow(day) - 1 AS dow, c,
      |    7 * c - t7 AS det7
      |  FROM det
      |  WHERE n7 = 7 AND date_diff('day', d0, d6) = 6)
      |SELECT event_type, CAST(dow AS BIGINT) AS dow,
      |  CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(c) AS BIGINT) AS sum_c,
      |  CAST(SUM(det7) AS BIGINT) AS sum_det7,
      |  (1000000 * CAST(SUM(det7) AS BIGINT))
      |    // (7 * CAST(SUM(c) AS BIGINT)) AS seasonal_ppm
      |FROM kept GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q56_funnel_conversion", Some(q56Sql), q56),
    QueryDef("q59_dau_wau", Some(q59Sql), q59),
    QueryDef("q62_dau_mau", Some(q62Sql), q62),
    QueryDef("x91_sliding_kmv", Some(x91Sql), x91),
    QueryDef("st11_daily_kmv", Some(st11Sql), st11),
    QueryDef("q60_retention_cohorts", Some(q60Sql), q60),
    QueryDef("q61_seasonality_decompose", Some(q61Sql), q61),
    QueryDef("a18_streaks", Some(a18Sql), a18),
    QueryDef("q32_benford", Some(q32Sql), q32),
    QueryDef("q33_distribution_drift", Some(q33Sql), q33),
    QueryDef("j15_fuzzy_join", Some(j15Sql), j15),
    QueryDef("x36_weighted_sample", Some(x36Sql), x36),
    QueryDef("q34_fd_audit", Some(q34Sql), q34),
    QueryDef("q50_fd_repair", Some(q50Sql), q50),
    QueryDef("a19_mode", Some(a19Sql), a19),
    QueryDef("x37_containment", Some(x37Sql), x37),
    QueryDef("q35_correlation", Some(q35Sql), q35),
    QueryDef("a20_time_weighted_avg", Some(a20Sql), a20),
    QueryDef("q36_contingency", Some(q36Sql), q36),
    QueryDef("q37_gini_profile", Some(q37Sql), q37),
    QueryDef("x38_template_prefixes", Some(x38Sql), x38),
    QueryDef("x39_centroid_profile", Some(x39Sql), x39),
    QueryDef("a21_ohlc", Some(a21Sql), a21),
    QueryDef("x40_dedup_best", Some(x40Sql), x40),
    QueryDef("a22_transition_matrix", Some(a22Sql), a22),
    QueryDef("x41_split_leakage", Some(x41Sql), x41),
    QueryDef("a23_activity_trend", Some(a23Sql), a23),
    QueryDef("a24_path_pattern", Some(a24Sql), a24),
    QueryDef("q38_hll_rollup", None, q38),
    QueryDef("q38b_hll_bound", Some(q38bSql), q38b),
    QueryDef("a25_incremental_rollup", Some(a25Sql), a25),
    QueryDef("st08_lateness_profile", Some(st08Sql), st08),
    QueryDef("st09_cusum_monitor", Some(st09Sql), st09),
    QueryDef("a26_audience_overlap", Some(a26Sql), a26),
    QueryDef("a27_ratio_to_report", Some(a27Sql), a27),
    QueryDef("q39_orphan_trend", Some(q39Sql), q39),
    QueryDef("q40_pricing_summary", Some(q40Sql), q40),
    QueryDef("q41_shipping_priority", Some(q41Sql), q41),
    QueryDef("q42_basket_affinity", Some(q42Sql), q42),
    QueryDef("a28_bounce_rate", Some(a28Sql), a28),
    QueryDef("q43_segment_momentum", Some(q43Sql), q43),
    QueryDef("j16_preagg_join", Some(j16Sql), j16),
    QueryDef("a29_percentile_bands", Some(a29Sql), a29),
    QueryDef("q44_dup_transactions", Some(q44Sql), q44),
    QueryDef("a30_interevent_gap", Some(a30Sql), a30),
    QueryDef("a31_winsorized", Some(a31Sql), a31),
    QueryDef("q45_ks_test", Some(q45Sql), q45),
    QueryDef("q46_rank_sum", Some(q46Sql), q46),
    QueryDef("q47_bootstrap_ci", Some(q47Sql), q47),
    QueryDef("a33_seasonality", Some(a33Sql), a33),
    QueryDef("x43_shard_balance", Some(x43Sql), x43)
  )

  // ---------------------------------------------------------------------
  // A31 — winsorized robust statistics per event type: p05/p95 clip
  // bounds from the q15 histogram kernel (exact, no value buffers),
  // clip counts, and the winsorized mean — the metric-pipeline answer
  // to "the mean is garbage because 0.1% of rows are sensor spikes".
  // The mean avoids casting COMPUTED doubles to decimal (q35 rule):
  // mid-range values accumulate in exact decimal off the histogram,
  // and the clipped tails enter as count×bound in a pinned-order IEEE
  // expression — (mid + lo·p05 + hi·p95) / n, identical both engines.
  // ---------------------------------------------------------------------
  private def a31(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.events(s, d)
      .groupBy(col("event_type"), col("value").as("v"))
      .agg(count(lit(1)).as("c"))
      .cut(false)
    val bounds = Relational.histCum(hist, "event_type", "v")
      .groupBy(col("event_type"))
      .agg(Relational.histPct(0.05, "v").as("p05"),
        Relational.histPct(0.95, "v").as("p95"))
    hist.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        sum(col("c")).as("n"),
        sum(when(col("v") < col("p05"), col("c")).otherwise(0L))
          .as("n_clipped_low"),
        sum(when(col("v") > col("p95"), col("c")).otherwise(0L))
          .as("n_clipped_high"),
        sum(when(col("v") >= col("p05") && col("v") <= col("p95"),
          col("v").cast("decimal(28,6)") * col("c")).otherwise(
            lit(0).cast("decimal(28,6)"))).cast("double").as("mid_sum"))
      .select(col("event_type"), col("p05"), col("p95"), col("n"),
        col("n_clipped_low"), col("n_clipped_high"),
        ((col("mid_sum") +
          col("n_clipped_low").cast("double") * col("p05") +
          col("n_clipped_high").cast("double") * col("p95")) /
          col("n").cast("double")).as("wins_mean"))
      .orderBy("event_type")
  }
  // ---------------------------------------------------------------------
  // Q45 — two-sample Kolmogorov–Smirnov drift test per event type:
  // D = max |ECDF_A − ECDF_B| between interleaved day-parity samples —
  // the distribution-shift detector with an actual statistic behind
  // it (q33's count-mix drift can't see a shape change at equal
  // volume). EXACT integer rank arithmetic end to end: value
  // histogram with per-sample counts, cumulative counts in value
  // order, D's numerator as max |cumA·nB − cumB·nA| (one IEEE
  // division at the very end) — bit-identical at any parallelism.
  // Scale note: the BIGINT cross-product bounds this exact form at
  // ~3·10⁹ rows per (group, sample); past that, pre-bin values into a
  // bounded histogram (the standard KS-on-histogram route) — same
  // plan, bounded counts.
  // ---------------------------------------------------------------------
  private def q45(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      col("value").as("v"),
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        % 2 === 0).as("a"))
    val hist = ev.groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      .cut(false) // cum window + totals read it twice
    val w = Window.partitionBy("event_type").orderBy("v")
    val cum = hist
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = hist.groupBy(col("event_type"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("d_num"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
        // One empty sample (n_a or n_b = 0) would make D = 0/0: emit
        // NULL — "test not applicable" — identically in both engines
        // instead of a NaN whose serialization the gate can't compare.
        when(col("n_a") * col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("ks_d"))
      .orderBy("event_type")
  }
  private lazy val q45Sql =
    """WITH ev AS (
      |  SELECT event_type, value AS v,
      |    CAST(ts AS DATE) - DATE '1970-01-01' AS epoch_day
      |  FROM events),
      |hist AS (
      |  SELECT event_type, v,
      |    CAST(SUM(CASE WHEN epoch_day % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN epoch_day % 2 <> 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM ev GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v, ca, cb,
      |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v) AS cuma,
      |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v) AS cumb
      |  FROM hist),
      |tot AS (
      |  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
      |    CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM hist GROUP BY 1)
      |SELECT c.event_type, MAX(t.na) AS n_a, MAX(t.nb) AS n_b,
      |  CAST(MAX(ABS(CAST(c.cuma AS BIGINT) * t.nb
      |    - CAST(c.cumb AS BIGINT) * t.na)) AS BIGINT) AS d_num,
      |  CASE WHEN t.na * t.nb = 0 THEN NULL ELSE
      |    CAST(MAX(ABS(CAST(c.cuma AS BIGINT) * t.nb
      |      - CAST(c.cumb AS BIGINT) * t.na)) AS DOUBLE)
      |      / CAST(t.na * t.nb AS DOUBLE) END AS ks_d
      |FROM cum c JOIN tot t USING (event_type)
      |GROUP BY 1, t.na, t.nb ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // A33 — weekday×hour seasonality profile per event type: the peak
  // cell plus a chi-square uniformity statistic over the full 168-cell
  // grid. The statistic is EXACT until one final division: the
  // numerator Σ(168·O − n)² accumulates in BIGINT (unobserved cells
  // contribute n² each — folded in arithmetically, not by
  // materializing empty cells), then χ² = num / (168·n) is a single
  // IEEE division. BIGINT holds to ~5·10⁸ rows per type; past that
  // the same sums run in DECIMAL(38,0) (q45's pre-binning note
  // pattern). Weekday = Monday-0 (the t12 pandas convention:
  // Spark (dayofweek+5)%7 ≡ DuckDB isodow−1). Peak pick is a
  // deterministic window (count desc, dow, hour). One bounded
  // (type × 168) aggregate; nothing scales past the grid.
  // ---------------------------------------------------------------------
  private def a33(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select(col("event_type"),
        ((dayofweek(col("ts")) + 5) % 7).as("dow"),
        hour(col("ts")).as("hr"))
      .groupBy(col("event_type"), col("dow"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val wPeak = Window.partitionBy("event_type")
      .orderBy(col("cnt").desc, col("dow"), col("hr"))
    val ranked = cells.withColumn("rn", row_number().over(wPeak))
    val stats = cells.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("observed_cells"),
        sum((lit(168L) * col("cnt")) * (lit(168L) * col("cnt")))
          .as("s168sq"),
        sum(lit(168L) * col("cnt")).as("s168"))
    // Σ_observed (168·O − n)² = Σ(168O)² − 2n·Σ(168O) + observed·n²;
    // + (168 − observed)·n² for the empty cells ⇒ num = Σ(168O)²
    //   − 2n·Σ(168O) + 168·n²  (all BIGINT)
    stats
      .withColumn("num", col("s168sq") - lit(2L) * col("n") * col("s168")
        + lit(168L) * col("n") * col("n"))
      .join(ranked.filter(col("rn") === 1)
        .select(col("event_type"), col("dow").as("peak_dow"),
          col("hr").as("peak_hour"), col("cnt").as("peak_n")),
        Seq("event_type"))
      .select(col("event_type"), col("n"), col("observed_cells"),
        col("peak_dow"), col("peak_hour"), col("peak_n"),
        (col("num").cast("double") /
          (lit(168L) * col("n")).cast("double")).as("chi2_uniform"))
      .orderBy("event_type")
  }
  private lazy val a33Sql =
    """WITH cells AS (
      |  SELECT event_type, isodow(ts) - 1 AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |peak AS (
      |  SELECT event_type, dow AS peak_dow, hr AS peak_hour,
      |    CAST(cnt AS BIGINT) AS peak_n
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY cnt DESC, dow, hr) AS rn FROM cells) WHERE rn = 1),
      |stats AS (
      |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS observed_cells,
      |    CAST(SUM((168 * cnt) * (168 * cnt)) AS BIGINT) AS s168sq,
      |    CAST(SUM(168 * cnt) AS BIGINT) AS s168
      |  FROM cells GROUP BY 1)
      |SELECT s.event_type, s.n, s.observed_cells,
      |  p.peak_dow, p.peak_hour, p.peak_n,
      |  CAST(s.s168sq - 2 * s.n * s.s168 + 168 * s.n * s.n AS DOUBLE)
      |    / CAST(168 * s.n AS DOUBLE) AS chi2_uniform
      |FROM stats s JOIN peak p USING (event_type)
      |ORDER BY s.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Q47 — Poisson-bootstrap confidence interval for the per-type mean:
  // THE distributed bootstrap (per-row independent Poisson(1) weights
  // instead of a global n-out-of-n resample, so no replicate ever
  // needs coordination — each row just fans out to B weighted
  // copies). Weights here are DETERMINISTIC: a Knuth-mixed hash of
  // (event_id, replicate) mapped through fixed integer thresholds
  // approximating Poisson(1) pmf to 4 digits — bit-identical in both
  // engines and across any partitioning, which makes a resampling CI
  // value-checkable at all (a seeded RNG never is across engines).
  // Replicate means use exact decimal numerators; the 2.5%/97.5%
  // bounds come from the q15 histogram-percentile kernel over the
  // B=32 replicate means. Scale: B× row fan-out, two keyed aggs, a
  // bounded (type × 32) grid — no global state.
  // ---------------------------------------------------------------------
  // lazy: read from lazy q47Sql during `all`'s init, which runs
  // before strict vals declared this late in the file
  private lazy val BootB = 32

  private def q47(s: SparkSession, d: String): DataFrame = {
    // One-pass form: the natural explode(sequence(0,31)) → groupBy
    // (type, r) materializes and hashes B× the event rows — pure CPU,
    // 14.8 s at sf1. Instead evaluate all B weight expressions per
    // INPUT row inside one codegen HashAggregate (2B conditional sums,
    // the x02 min-agg trick) and unpivot the B (sum, n) column pairs
    // afterwards — replicate means are identical because the decimal
    // accumulation is order-independent. Measured 1.9× at sf1
    // (14.8 → 7.8 s steady state), and the B× row fan-out is gone
    // entirely, which is what matters at 100 TB.
    // Inline scalar expressions beat a precomputed weight ARRAY here:
    // transform() is a higher-order function, which is excluded from
    // whole-stage codegen — the array form measured 11.4 s vs 8.2 s
    // at sf1. Codegen subexpression elimination already shares the
    // repeated Knuth mix (pre-reduced modulo 2^31 before the
    // multiply: Long wraps silently past id ~3.5e9 while DuckDB
    // raises, so the raw product would diverge the engines at scale).
    def u(r: Int): Column = pmod(
      ((col("event_id") % 2147483648L) * 2654435761L
        + lit(r.toLong) * 97L) % 1000000007L, lit(10000L))
    def w(r: Int): Column =
      when(u(r) < 3679, 0L).when(u(r) < 7358, 1L)
        .when(u(r) < 9197, 2L).when(u(r) < 9810, 3L)
        .when(u(r) < 9963, 4L).otherwise(5L)
    val aggs = (0 until BootB).flatMap { r =>
      Seq(sum(col("vd") * w(r)).as(s"s$r"), sum(w(r)).as(s"n$r"))
    }
    val wide = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        col("value").cast("decimal(18,6)").as("vd"))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
    val stackExpr = (0 until BootB).map(r => s"$r, s$r, n$r")
      .mkString(s"stack($BootB, ", ", ", ") as (r, sv, nv)")
    val repMeans = wide
      .select(col("event_type"), expr(stackExpr))
      .select(col("event_type"),
        (col("sv").cast("double") / col("nv").cast("double")).as("m"))
    val hist = repMeans.groupBy(col("event_type"), col("m").as("v"))
      .agg(count(lit(1)).as("c"))
    val ci = Relational.histCum(hist, "event_type", "v")
      .groupBy(col("event_type"))
      .agg(Relational.histPct(0.025, "v").as("ci_lo"),
        Relational.histPct(0.975, "v").as("ci_hi"))
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Num.davg(col("value")).as("mean"))
      .join(broadcast(ci), Seq("event_type"))
      .select(col("event_type"), col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"))
      .orderBy("event_type")
  }
  private lazy val q47Sql = {
    val b = BootB
    s"""WITH weighted AS (
       |  SELECT event_type, value,
       |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
       |         WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
       |         WHEN u < 9963 THEN 4 ELSE 5 END AS w, r
       |  FROM (
       |    SELECT event_type, value, r,
       |      ((event_id % 2147483648) * 2654435761 + r * 97)
       |        % 1000000007 % 10000 AS u
       |    FROM events, unnest(generate_series(0, ${b - 1})) AS t(r))),
       |rep AS (
       |  SELECT event_type, r,
       |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)) * w) AS VARCHAR)
       |      AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS v
       |  FROM weighted GROUP BY 1, 2),
       |hist AS (
       |  SELECT event_type, v, COUNT(*) AS c FROM rep GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, v, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum_hi,
       |    CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE) AS nn
       |  FROM hist),
       |ci AS (
       |  SELECT event_type,
       |    ${Relational.sqlHistPct("0.025", "v")} AS ci_lo,
       |    ${Relational.sqlHistPct("0.975", "v")} AS ci_hi
       |  FROM cum GROUP BY 1)
       |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${Num.sqlDavg("e.value")} AS mean,
       |  MIN(ci.ci_lo) AS ci_lo, MIN(ci.ci_hi) AS ci_hi
       |FROM events e JOIN ci USING (event_type)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Q46 — Mann–Whitney U (rank-sum) per event type, q45's companion
  // nonparametric test: LOCATION shift where KS is shape shift. Exact
  // midranks under ties via the DOUBLED-rank trick — over the value
  // histogram, each distinct value's A-observations contribute
  // ca·(2·cum_before + ties + 1) to 2R_A, so 2U_A = Σ − nA(nA+1)
  // stays in BIGINT until the final divisions (U itself and the
  // rank-biserial effect size r = 1 − 2U/(nA·nB)). One histogram
  // shuffle + one distinct-value window; no totals join needed — nA
  // and nB fold out of the same final aggregate.
  // ---------------------------------------------------------------------
  private def q46(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      col("value").as("v"),
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        % 2 === 0).as("a"))
    val hist = ev.groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_before",
        coalesce(sum(col("ca") + col("cb")).over(w), lit(0L)))
      .withColumn("contrib", col("ca") *
        (lit(2L) * col("cum_before") + col("ca") + col("cb") + 1L))
      .groupBy(col("event_type"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("contrib")).as("r2a"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (col("r2a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        (col("u2_a").cast("double") / 2.0).as("u_a"),
        // Same empty-sample guard as q45's ks_d: NULL, not ±Infinity.
        when(col("n_a") * col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(lit(1.0) - col("u2_a").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("effect_r"))
      .orderBy("event_type")
  }
  private lazy val q46Sql =
    """WITH ev AS (
      |  SELECT event_type, value AS v,
      |    CAST(ts AS DATE) - DATE '1970-01-01' AS epoch_day
      |  FROM events),
      |hist AS (
      |  SELECT event_type, v,
      |    CAST(SUM(CASE WHEN epoch_day % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN epoch_day % 2 <> 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM ev GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, ca, cb,
      |    COALESCE(SUM(ca + cb) OVER (PARTITION BY event_type
      |      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      1 PRECEDING), 0) AS cum_before
      |  FROM hist),
      |agg AS (
      |  SELECT event_type,
      |    CAST(SUM(ca) AS BIGINT) AS n_a,
      |    CAST(SUM(cb) AS BIGINT) AS n_b,
      |    CAST(SUM(ca * (2 * cum_before + ca + cb + 1)) AS BIGINT)
      |      AS r2a
      |  FROM cum GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      |  CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
      |  CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
      |  CASE WHEN n_a * n_b = 0 THEN NULL ELSE
      |    1.0 - CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
      |      / CAST(n_a * n_b AS DOUBLE) END AS effect_r
      |FROM agg ORDER BY event_type""".stripMargin

  // lazy: referenced from `all` above its definition — a strict val
  // would still be null when the registration list initializes
  private lazy val a31Sql =
    s"""WITH hist AS (
       |  SELECT event_type, value AS v, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, v, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum_hi,
       |    CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE) AS nn
       |  FROM hist),
       |b AS (
       |  SELECT event_type,
       |    ${Relational.sqlHistPct("0.05", "v")} AS p05,
       |    ${Relational.sqlHistPct("0.95", "v")} AS p95
       |  FROM cum GROUP BY 1),
       |agg AS (
       |  SELECT h.event_type, MAX(b.p05) AS p05, MAX(b.p95) AS p95,
       |    CAST(SUM(h.c) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN h.v < b.p05 THEN h.c ELSE 0 END)
       |      AS BIGINT) AS n_clipped_low,
       |    CAST(SUM(CASE WHEN h.v > b.p95 THEN h.c ELSE 0 END)
       |      AS BIGINT) AS n_clipped_high,
       |    CAST(CAST(SUM(CASE WHEN h.v >= b.p05 AND h.v <= b.p95
       |        THEN CAST(h.v AS DECIMAL(28,6)) * h.c
       |        ELSE CAST(0 AS DECIMAL(28,6)) END) AS VARCHAR)
       |      AS DOUBLE) AS mid_sum
       |  FROM hist h JOIN b USING (event_type) GROUP BY 1)
       |SELECT event_type, p05, p95, n, n_clipped_low, n_clipped_high,
       |  (mid_sum + CAST(n_clipped_low AS DOUBLE) * p05
       |    + CAST(n_clipped_high AS DOUBLE) * p95)
       |    / CAST(n AS DOUBLE) AS wins_mean
       |FROM agg ORDER BY event_type""".stripMargin
}
