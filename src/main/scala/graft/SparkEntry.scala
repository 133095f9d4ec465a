package graft

import graft.queries.{Advanced, CorpusEtl, DedupSim, FullEtl, Insights, Media, Relational, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extension set) is declared once as a [[QueryDef]] in the
  * `graft.queries` modules; this object just flattens them into the
  * driver's maps.
  */
object SparkEntry {

  val defs: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ DedupSim.all ++ Media.all ++
      FullEtl.all ++ Advanced.all ++ Insights.all ++ CorpusEtl.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q9 — the scan→join→filter→agg→sort→limit spine (SURVEY.md §7 step 1).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q09(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
