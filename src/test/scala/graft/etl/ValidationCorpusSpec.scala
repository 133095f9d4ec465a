package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runs the reference's REAL validation.sql (461 lines) against the
  * warehouse built from the demo fixtures — the full
  * `validate_data_quality` path (main_etl_pipeline.py:797-870). */
class ValidationCorpusSpec extends SparkSpec {

  private val scriptPath = "/root/reference/validation.sql"

  private lazy val script =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(scriptPath)))

  private lazy val tables =
    Pipeline.run(spark, Pipeline.demoInputs(spark), None).tables

  test("parses the full statement corpus") {
    val stmts = SqlRunner.parse(script)
    // 7 SET vars + inventory/missing + 18 PK + 17 FK + NULL/domain/range
    // + coverage + distribution + smoke + violations DDL/inserts/summary
    assert(stmts.size >= 75, s"got ${stmts.size}")
    assert(stmts.count(_.toUpperCase.startsWith("SET @")) == 7)
  }

  test("every statement executes on the built warehouse; clean = 100.0") {
    val out = ValidationCorpus.run(spark, script, tables)
    assert(out.failed.isEmpty,
      out.failed.map { case (s, e) => s"$s => $e" }.mkString("\n"))
    assert(out.executed == out.statements)
    assert(out.score == 100.0)
    assert(out.issues.isEmpty && out.warnings.isEmpty)
    assert(out.tableCounts.size == 19)
    assert(out.tableCounts("dim_date") == 3653L)
  }

  test("planted orphans surface through the corpus scoring") {
    // fact_usersnapshot→dim_user is the aliased ORPHANS check (the later
    // un-aliased ones are invisible to scoring — a reference quirk we
    // mirror); workoutsession orphans surface via the violations table.
    val broken = tables.map {
      case ("fact_usersnapshot", df) =>
        "fact_usersnapshot" -> df.withColumn("user_key", lit(999999))
      case ("fact_workoutsession", df) =>
        "fact_workoutsession" -> df.withColumn("user_key", lit(999999))
      case other => other
    }
    val out = ValidationCorpus.run(spark, script, broken)
    assert(out.score <= 95.0)
    assert(out.issues.exists(_.startsWith("ORPHANS: Fact_UserSnapshot")))
    // the reference's final violations-table re-query reports the rest
    assert(out.issues.exists(_.startsWith("FK orphan: WorkoutSession->User")))
  }
}
