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

  /** A rule's check, DECLARATIVE so `runSuite` can fuse every rule on a
    * table into one aggregate pass (one scan per table, not one per
    * rule — at warehouse scale N serial scans of the same fact table is
    * the difference between one job and N). */
  sealed trait Check
  /** A conditional-count aggregate expression over the audited table. */
  final case class AggCheck(expr: Column) extends Check
  /** Needs the dim side: broadcast left-joined on distinct pk (row-
    * preserving), counted in the same aggregate pass as the AggChecks. */
  final case class FkCheck(dim: DataFrame, fk: String, pk: String)
    extends Check

  final case class Rule(name: String, severity: Severity, check: Check)

  /** Q2 — PK uniqueness: rows − distinct(pk). */
  def pkUniqueness(pk: Seq[Column]): Check =
    AggCheck(count(lit(1)) - countDistinct(pk.head, pk.tail: _*))

  /** Q3 — FK orphans: fact rows whose fk misses the dim. NULL fks count
    * as orphans (anti-join-on-equality semantics, matching the
    * reference's LEFT JOIN … IS NULL checks, validation.sql §3). */
  def fkOrphans(dim: DataFrame, fk: String, pk: String): Check =
    FkCheck(dim, fk, pk)

  /** Q4 — required column is null. */
  def nullViolations(c: String): Check =
    AggCheck(sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Q6 — value outside [lo, hi]. */
  def rangeViolations(c: String, lo: Double, hi: Double): Check =
    AggCheck(sum(
      when(col(c).isNotNull && !col(c).between(lo, hi), 1L).otherwise(0L)))

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
    * validate_data_quality shape (main_etl_pipeline.py:797-870).
    *
    * Rules are fused PER TABLE: all FkChecks become broadcast left-joins
    * (distinct dim keys, so fact cardinality is preserved and the other
    * rules' counts are unaffected), then every rule evaluates as one
    * column of a single `.agg(...)` — one scan of each audited table
    * regardless of rule count. The per-table aggregate JOBS run
    * concurrently (they are independent; Spark's scheduler interleaves
    * them) — serially, a 19-table warehouse pays 19× fixed job-launch
    * latency, which at toy scale dominates the actual scan work. */
  def runSuite(pairs: Seq[(Rule, DataFrame)]): Report = {
    val indexed = pairs.zipWithIndex
    val counts = new Array[Long](pairs.size)
    val groups = indexed.groupBy { case ((_, df), _) => df }.toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(groups.size, 8)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = groups.map { case (table, group) =>
        scala.concurrent.Future {
          var joined = table
          val aggCols = group.map { case ((rule, _), idx) =>
            val c = rule.check match {
              case AggCheck(e) => e
              case FkCheck(dim, fk, pk) =>
                val a = s"__graft_pk_$idx"
                // no broadcast hint: dims can outgrow the driver at
                // scale; AQE broadcasts from runtime sizes while they fit
                joined = joined.join(dim.select(col(pk).as(a)).distinct(),
                  col(fk) === col(a), "left")
                sum(when(col(a).isNull, 1L).otherwise(0L))
            }
            coalesce(c.cast("long"), lit(0L)).as(s"__c$idx")
          }
          val row = joined.agg(aggCols.head, aggCols.tail: _*).head()
          group.map(_._2).zipWithIndex.map { case (idx, i) =>
            idx -> row.getLong(i)
          }
        }
      }
      scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
        .flatten.foreach { case (idx, v) => counts(idx) = v }
    } finally pool.shutdown()
    val results = indexed.map { case ((r, _), idx) =>
      RuleResult(r.name,
        r.severity match { case Issue => "issue"; case Warning => "warning" },
        counts(idx))
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
