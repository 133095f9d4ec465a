package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rule suite + scoring (SURVEY.md §2.4 Q2–Q6, §5):
  * the reference's validation.sql rule classes and
  * `_process_validation_row` scoring (main_etl_pipeline.py:902-920)
  * as composable Spark checks.
  *
  * Each rule evaluates to a (rule, violation_count) row; `score` applies
  * the reference's semantics: hard-rule violations −5 each, warnings −1,
  * floor at 0, starting from 100.
  */
object Quality {

  sealed trait Severity
  case object Issue extends Severity    // −5 (PK/ORPHAN/NULL classes)
  case object Warning extends Severity  // −1 (range/domain classes)

  final case class Rule(name: String, severity: Severity,
      count: DataFrame => Long)

  /** Q2 — PK uniqueness: rows − distinct(pk). */
  def pkUniqueness(pk: Seq[Column]): DataFrame => Long = df =>
    df.agg((count(lit(1)) - countDistinct(pk.head, pk.tail: _*)).as("d"))
      .head().getLong(0)

  /** Q3 — FK orphans: fact rows whose fk misses the dim (anti-join).
    * The dim key is re-aliased so fk == pk names never collide. */
  def fkOrphans(dim: DataFrame, fk: String, pk: String): DataFrame => Long =
    fact => fact.join(broadcast(dim.select(col(pk).as("__graft_pk"))),
      fact(fk) === col("__graft_pk"), "left_anti").count()

  /** Q4 — required column is null. */
  def nullViolations(c: String): DataFrame => Long =
    df => df.filter(col(c).isNull).count()

  /** Q6 — value outside [lo, hi]. */
  def rangeViolations(c: String, lo: Double, hi: Double): DataFrame => Long =
    df => df.filter(col(c).isNotNull && !col(c).between(lo, hi)).count()

  final case class RuleResult(rule: String, severity: String,
      violations: Long)
  final case class Report(score: Double, issues: Long, warnings: Long,
      results: Seq[RuleResult])

  /** Run rules against a table and score (main_etl_pipeline.py:902-920):
    * 100 − 5·issueRules − 1·warningRules (rules with >0 violations),
    * floored at 0. */
  def run(table: DataFrame, rules: Seq[Rule]): Report =
    runSuite(rules.map(_ -> table))

  /** Multi-table form: each rule paired with the table it audits — one
    * combined score across the whole warehouse, the reference's
    * validate_data_quality shape (main_etl_pipeline.py:797-870). */
  def runSuite(pairs: Seq[(Rule, DataFrame)]): Report = {
    val results = pairs.map { case (r, df) =>
      RuleResult(r.name,
        r.severity match { case Issue => "issue"; case Warning => "warning" },
        r.count(df))
    }
    val issues = results.count(r => r.severity == "issue" && r.violations > 0)
    val warnings =
      results.count(r => r.severity == "warning" && r.violations > 0)
    val score = math.max(0.0, 100.0 - 5.0 * issues - 1.0 * warnings)
    Report(score, issues, warnings, results)
  }

  /** JSON report shape of generate_summary_report
    * (main_etl_pipeline.py:926-937). */
  def toJson(r: Report): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val rules = r.results.map(x =>
      s"""{"rule":"${esc(x.rule)}","severity":"${x.severity}",""" +
        s""""violations":${x.violations}}""").mkString("[", ",", "]")
    s"""{"quality_score":${r.score},"issues":${r.issues},""" +
      s""""warnings":${r.warnings},"rules":$rules}"""
  }
}
