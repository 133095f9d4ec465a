package graft.queries

import graft.{QueryDef, Tables}
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("w03_corpus_etl", Some(w03Sql), w03)
  )
}
