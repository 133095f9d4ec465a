package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.{EntityResolution, Normalize, Warehouse}
import graft.etl.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** W2 — the reference's FULL ETL DAG (main_etl_pipeline.py:947-976)
  * exercised end-to-end over driver testdata, oracle-checked: two
  * profile sources (customer, supplier) → entity resolution (hash →
  * dedup → two-phase key minting) → dims from distincts AND from
  * tokenized blobs → M:N bridge → three fact builds (lookup joins,
  * unpivot, seeded T16 generator) → per-table count+checksum summary.
  *
  * The fitness-shaped twin of this DAG (FIXTURES.md schemas, 18 tables)
  * lives in graft.etl.Pipeline and is spec-tested; this query proves the
  * same composition against the DuckDB oracle on shared data.
  *
  * Determinism notes: profile-hash floats are integerized with `floor`
  * (never `round` — exact .5 ties are the one place Spark and DuckDB
  * rounding can diverge); minted keys order by unique hash/name; the
  * synthetic stage is the seeded LCG of t16.
  */
object FullEtl {

  private val goalTaxonomy = Seq(
    "building" -> Seq("building"),
    "auto" -> Seq("auto"),
    "machine" -> Seq("machin"))

  private def dateKey(dc: Column): Column =
    (year(dc) * 10000 + month(dc) * 100 + dayofmonth(dc)).cast("long")

  private def w02(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val profs = c.select(
        concat(lit("customer_"), col("c_custkey").cast("string"))
          .as("original_id"),
        lit(1).as("prio"),
        col("c_nationkey").cast("long").as("age"),
        (col("c_nationkey") % 2).cast("string").as("gender"),
        floor(col("c_acctbal") * 100).cast("long").as("h100"),
        floor(col("c_acctbal") * 10).cast("long").as("w10"),
        col("c_mktsegment").as("goal_text"),
        concat_ws(", ", col("c_mktsegment"),
          concat(lit("nation_"), col("c_nationkey").cast("string")))
          .as("blob"))
      .unionByName(sup.select(
        concat(lit("supplier_"), col("s_suppkey").cast("string"))
          .as("original_id"),
        lit(2).as("prio"),
        col("s_nationkey").cast("long").as("age"),
        (col("s_nationkey") % 2).cast("string").as("gender"),
        floor(col("s_acctbal") * 100).cast("long").as("h100"),
        floor(col("s_acctbal") * 10).cast("long").as("w10"),
        col("s_name").as("goal_text"),
        concat(lit("nation_"), col("s_nationkey").cast("string"))
          .as("blob")))
    val hashCol = concat_ws("_", col("age").cast("string"), col("gender"),
      col("h100").cast("string"), col("w10").cast("string"))
    val (canonical0, mapping) = EntityResolution.resolve(profs, hashCol,
      col("prio"), col("original_id"))
    // the canonical/user-map subtrees feed every dim, fact, and summary
    // branch below — persist so the 9-way union doesn't re-run entity
    // resolution per branch (Spark has no common-subtree reuse)
    val canonical = canonical0.withColumn("goal_name",
      Normalize.keywordClassify(col("goal_text"), goalTaxonomy, "other"))
      .persist()
    val userMap = mapping.select("original_id", "user_key").persist()

    val dimGoal = Warehouse.dimFromDistinct(canonical, "goal_name",
      "goal_key", "goal_name")
    val dimToken = Warehouse.dimFromBlob(canonical, "blob",
      "token_key", "token_name")
    val o = Tables.orders(s, d)
    val dimPriority = Warehouse.dimFromDistinct(o, "o_orderpriority",
      "priority_key", "priority_name")
    val bridge = Warehouse.bridgeFromBlob(canonical, "user_key", "blob",
      dimToken, "token_key", "token_name")

    val factSnapshot = canonical.join(broadcast(dimGoal), Seq("goal_name"))
    // user mapping grows with the corpus — no broadcast hint, AQE decides
    val factOrders = o
      .withColumn("original_id",
        concat(lit("customer_"), col("o_custkey").cast("string")))
      .join(userMap, Seq("original_id"))
      .join(broadcast(dimPriority),
        col("o_orderpriority") === col("priority_name"))
      .select(col("user_key"), dateKey(col("o_orderdate")).as("date_key"),
        col("priority_key"))
    val factMetrics = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 20 === 0)
      .join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("original_id",
        concat(lit("customer_"), col("o_custkey").cast("string")))
      .join(userMap, Seq("original_id"))
      .select(col("user_key"), dateKey(col("l_shipdate")).as("date_key"),
        expr("""stack(3, 'quantity', l_quantity, 'price', l_extendedprice,
                'discount', l_discount) AS (metric, value)"""))

    // T16 — seeded LCG generator sized by the resolved user count (one
    // driver-side scalar; catalog stats at real scale)
    val nUsers = canonical.count()
    def lcg(k: Int): Column = pmod(
      (col("id") + lit(42L)) * lit(1103515245L + 2531011L * k) +
        lit(12345L * (k + 1)), lit(2147483647L))
    val synth = s.range(1000L)
      .withColumn("user_key", (pmod(lcg(1), lit(nUsers)) + 1).cast("long"))
      .withColumn("day", pmod(lcg(2), lit(30)).cast("long"))
      .withColumn("qty100", (pmod(lcg(3), lit(300)) + 50).cast("long"))

    def summary(name: String, df: DataFrame, checksum: Column): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_rows"),
          coalesce(sum(checksum), lit(0L)).cast("long").as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))

    val out = Seq(
      summary("dim_user", canonical, col("user_key") * col("age")),
      summary("dim_goal", dimGoal,
        col("goal_key") * length(col("goal_name"))),
      summary("dim_token", dimToken,
        col("token_key") * length(col("token_name"))),
      summary("dim_priority", dimPriority,
        col("priority_key") * length(col("priority_name"))),
      summary("bridge_user_token", bridge,
        col("user_key") + col("token_key")),
      summary("fact_snapshot", factSnapshot,
        col("user_key") * col("goal_key")),
      summary("fact_orders", factOrders,
        col("user_key") + col("date_key") + col("priority_key")),
      summary("fact_metrics", factMetrics,
        col("user_key") + col("date_key")),
      summary("fact_synth", synth,
        col("user_key") * col("day") + col("qty100"))
    ).reduce(_ unionByName _).orderBy("table_name")
      // the summary is 9 rows — materialize it now (localCheckpoint is
      // eager) so the persisted subtrees can be dropped before returning;
      // otherwise repeated bench warm+timed runs pile cached canonical/
      // userMap copies into the shared session
      .cut()
    canonical.unpersist()
    userMap.unpersist()
    out
  }

  private val w02Sql = {
    val tokenize =
      """list_filter(list_transform(
        |  string_split_regex(lower(blob), '[,\n]| and '), x -> trim(x)),
        |  x -> x <> '')""".stripMargin.replace("\n", " ")
    s"""WITH profs AS (
       |  SELECT 'customer_' || CAST(c_custkey AS VARCHAR) AS original_id,
       |    1 AS prio, CAST(c_nationkey AS BIGINT) AS age,
       |    CAST(c_nationkey % 2 AS VARCHAR) AS gender,
       |    CAST(floor(c_acctbal * 100) AS BIGINT) AS h100,
       |    CAST(floor(c_acctbal * 10) AS BIGINT) AS w10,
       |    c_mktsegment AS goal_text,
       |    concat_ws(', ', c_mktsegment,
       |      'nation_' || CAST(c_nationkey AS VARCHAR)) AS blob
       |  FROM customer
       |  UNION ALL
       |  SELECT 'supplier_' || CAST(s_suppkey AS VARCHAR), 2,
       |    CAST(s_nationkey AS BIGINT), CAST(s_nationkey % 2 AS VARCHAR),
       |    CAST(floor(s_acctbal * 100) AS BIGINT),
       |    CAST(floor(s_acctbal * 10) AS BIGINT),
       |    s_name, 'nation_' || CAST(s_nationkey AS VARCHAR)
       |  FROM supplier),
       |hashed AS (
       |  SELECT *, concat_ws('_', CAST(age AS VARCHAR), gender,
       |    CAST(h100 AS VARCHAR), CAST(w10 AS VARCHAR)) AS profile_hash
       |  FROM profs),
       |users AS (
       |  SELECT *,
       |    CAST(ROW_NUMBER() OVER (ORDER BY profile_hash) AS INT)
       |      AS user_key,
       |    CASE WHEN lower(goal_text) LIKE '%building%' THEN 'building'
       |         WHEN lower(goal_text) LIKE '%auto%' THEN 'auto'
       |         WHEN lower(goal_text) LIKE '%machin%' THEN 'machine'
       |         ELSE 'other' END AS goal_name
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY profile_hash
       |          ORDER BY prio, original_id) AS rn FROM hashed)
       |  WHERE rn = 1),
       |umap AS (
       |  SELECT h.original_id, u.user_key FROM hashed h
       |  JOIN users u ON h.profile_hash = u.profile_hash),
       |dim_goal AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY goal_name) AS INT)
       |    AS goal_key, goal_name
       |  FROM (SELECT DISTINCT goal_name FROM users)),
       |tokens AS (
       |  SELECT user_key, unnest($tokenize) AS token_name FROM users),
       |dim_token AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY token_name) AS INT)
       |    AS token_key, token_name
       |  FROM (SELECT DISTINCT token_name FROM tokens)),
       |bridge AS (
       |  SELECT DISTINCT t.user_key, dt.token_key
       |  FROM tokens t JOIN dim_token dt ON t.token_name = dt.token_name),
       |dim_priority AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority_name) AS INT)
       |    AS priority_key, priority_name
       |  FROM (SELECT DISTINCT o_orderpriority AS priority_name
       |        FROM orders WHERE o_orderpriority IS NOT NULL)),
       |fact_orders AS (
       |  SELECT m.user_key,
       |    CAST(year(o.o_orderdate) * 10000 + month(o.o_orderdate) * 100
       |      + day(o.o_orderdate) AS BIGINT) AS date_key,
       |    dp.priority_key
       |  FROM orders o
       |  JOIN umap m
       |    ON m.original_id = 'customer_' || CAST(o.o_custkey AS VARCHAR)
       |  JOIN dim_priority dp ON o.o_orderpriority = dp.priority_name),
       |fact_metrics AS (
       |  SELECT m.user_key,
       |    CAST(year(l.l_shipdate) * 10000 + month(l.l_shipdate) * 100
       |      + day(l.l_shipdate) AS BIGINT) AS date_key, mm.metric
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN umap m
       |    ON m.original_id = 'customer_' || CAST(o.o_custkey AS VARCHAR)
       |  CROSS JOIN (SELECT unnest(['quantity', 'price', 'discount'])
       |    AS metric) mm
       |  WHERE l.l_orderkey % 20 = 0),
       |synth AS (
       |  SELECT ((i + 42) * 1106046256 + 24690) % 2147483647
       |      % (SELECT COUNT(*) FROM users) + 1 AS user_key,
       |    ((i + 42) * 1108577267 + 37035) % 2147483647 % 30 AS day,
       |    ((i + 42) * 1111108278 + 49380) % 2147483647 % 300 + 50
       |      AS qty100
       |  FROM range(1000) t(i))
       |SELECT * FROM (
       |  SELECT 'dim_user' AS table_name, COUNT(*) AS n_rows,
       |    CAST(COALESCE(SUM(user_key * age), 0) AS BIGINT) AS checksum
       |  FROM users
       |  UNION ALL SELECT 'dim_goal', COUNT(*),
       |    CAST(COALESCE(SUM(goal_key * length(goal_name)), 0) AS BIGINT)
       |  FROM dim_goal
       |  UNION ALL SELECT 'dim_token', COUNT(*),
       |    CAST(COALESCE(SUM(token_key * length(token_name)), 0) AS BIGINT)
       |  FROM dim_token
       |  UNION ALL SELECT 'dim_priority', COUNT(*),
       |    CAST(COALESCE(SUM(priority_key * length(priority_name)), 0)
       |      AS BIGINT)
       |  FROM dim_priority
       |  UNION ALL SELECT 'bridge_user_token', COUNT(*),
       |    CAST(COALESCE(SUM(user_key + token_key), 0) AS BIGINT)
       |  FROM bridge
       |  UNION ALL SELECT 'fact_snapshot', COUNT(*),
       |    CAST(COALESCE(SUM(u.user_key * g.goal_key), 0) AS BIGINT)
       |  FROM users u JOIN dim_goal g ON u.goal_name = g.goal_name
       |  UNION ALL SELECT 'fact_orders', COUNT(*),
       |    CAST(COALESCE(SUM(user_key + date_key + priority_key), 0)
       |      AS BIGINT)
       |  FROM fact_orders
       |  UNION ALL SELECT 'fact_metrics', COUNT(*),
       |    CAST(COALESCE(SUM(user_key + date_key), 0) AS BIGINT)
       |  FROM fact_metrics
       |  UNION ALL SELECT 'fact_synth', COUNT(*),
       |    CAST(COALESCE(SUM(user_key * day + qty100), 0) AS BIGINT)
       |  FROM synth
       |) ORDER BY table_name""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("w02_full_etl", Some(w02Sql), w02))
}
