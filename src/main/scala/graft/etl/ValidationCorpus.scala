package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executes the reference's FULL validation corpus
  * (/root/reference/validation.sql, 461 lines) against a warehouse built
  * by [[Pipeline]], with the reference's row scoring
  * (main_etl_pipeline.py:902-920) — the end-to-end analogue of
  * `validate_data_quality`.
  *
  * A small, documented MySQL→Spark dialect shim handles the constructs
  * Spark SQL lacks:
  *  - `SET @VAR = v` session variables → collected and substituted as
  *    literals (the reference's tunable bounds, validation.sql:7-13);
  *  - `information_schema.tables` → a `graft_tables` temp view built
  *    from the registered warehouse (Spark's catalog equivalent);
  *  - `information_schema.statistics` → an empty `graft_indexes` view
  *    (Spark has no indexes — the honest Q12 answer; partitioning is
  *    reported by the physical layout, not a catalog);
  *  - `GROUP_CONCAT(... ORDER BY ...)` → `array_join(array_sort(...))`;
  *  - bare `CREATE TABLE` → `USING PARQUET` datasource table.
  *
  * Scoring mirrors `_process_validation_row` exactly, including its
  * quirks: only rows whose result-set exposes a column literally named
  * check_name/rule and violations/violation_count/orphan_count/
  * duplicate_pk participate, and the hard-class match is
  * case-sensitive (`'FK orphan: …'` rows score as warnings).
  */
object ValidationCorpus {

  final case class Outcome(statements: Int, executed: Int,
      failed: Seq[(String, String)], score: Double, issues: Seq[String],
      warnings: Seq[String], tableCounts: Map[String, Long])

  /** snake_case → CamelCase (user_key → UserKey), matching the reference
    * DDL's column names (db_schema.sql); resolution is case-insensitive
    * so OriginalId ≡ OriginalID etc. */
  private[etl] def camel(c: String): String =
    c.split("_").filter(_.nonEmpty).map(_.capitalize).mkString

  /** Register warehouse tables as temp views under their load names with
    * reference-shaped column names, plus the information_schema
    * stand-ins. */
  def register(spark: SparkSession,
      tables: Seq[(String, DataFrame)]): Map[String, Long] = {
    import spark.implicits._
    val present = tables.filter(_._2.columns.nonEmpty)
    present.foreach { case (name, df) =>
      df.toDF(df.columns.map(camel).toIndexedSeq: _*)
        .createOrReplaceTempView(name)
    }
    val counts = present.map { case (n, df) => n -> df.count() }
    counts.toDF("table_name", "table_rows")
      .createOrReplaceTempView("graft_tables")
    // Q12 stand-in: Spark has no indexes, so information_schema.statistics
    // reports the ported DDL's CREATE INDEX statements as the Spark-native
    // layout decisions they became (SchemaDdl.indexNotes) — a genuine
    // partition/bucket/broadcast introspection, not an empty view.
    val registered = present.map(_._1).toSet
    SchemaDdl.indexNotes
      .collect { case (t, ix, c, seq, nu, _) if registered(t) =>
        (t, ix, c, seq, nu) }
      .toDF("table_name", "index_name", "column_name", "seq_in_index",
        "non_unique")
      .createOrReplaceTempView("graft_indexes")
    counts.toMap
  }

  /** MySQL → Spark SQL dialect shim (see object doc). */
  def translate(sql: String): String = {
    var s = sql
    s = s.replaceAll("(?i)\\w+\\.table_schema\\s*=\\s*DATABASE\\(\\)\\s*AND\\s*", "")
    s = s.replaceAll("(?i)table_schema\\s*=\\s*DATABASE\\(\\)", "1=1")
    s = s.replaceAll("(?i)information_schema\\.tables", "graft_tables")
    s = s.replaceAll("(?i)information_schema\\.statistics", "graft_indexes")
    s = s.replaceAll(
      "(?i)GROUP_CONCAT\\(DISTINCT\\s+(\\w+)\\s+ORDER\\s+BY\\s+\\w+\\)",
      "array_join(array_sort(collect_set($1)), ',')")
    s = s.replaceAll("(?i)GROUP_CONCAT\\((\\w+)\\s+ORDER\\s+BY\\s+(\\w+)\\)",
      "array_join(transform(array_sort(collect_list(struct($2, $1))), " +
        "x -> x.$1), ',')")
    if (s.trim.toUpperCase.startsWith("CREATE TABLE")) s + " USING PARQUET"
    else s
  }

  /** Serialized per JVM: the corpus registers fixed-name temp views and
    * a fixed-name managed table (`validation_violations` — the script
    * hardcodes it), so two concurrent runs in one session would clobber
    * each other (e.g. sbt's parallel test suites on the shared session). */
  def run(spark: SparkSession, script: String,
      tables: Seq[(String, DataFrame)]): Outcome = synchronized {
    val counts = register(spark, tables)
    // re-runnable: drop the table AND any stale managed-table directory
    // a previous crashed session left behind (the in-memory catalog
    // forgets the table but the location blocks CREATE TABLE)
    spark.sql("DROP TABLE IF EXISTS validation_violations")
    val stale = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "validation_violations")
    if (stale.isDirectory) {
      stale.listFiles().foreach(_.delete()); stale.delete()
    }
    val stmts = SqlRunner.parse(script)
    val vars = scala.collection.mutable.LinkedHashMap[String, String]()
    val failed = Seq.newBuilder[(String, String)]
    var (issues, warnings) = (Vector.empty[String], Vector.empty[String])
    var (executed, score) = (0, 100.0)
    val setRe = "(?is)^SET\\s+@(\\w+)\\s*=\\s*(.+)$".r
    val hardClasses = Seq("PK CHECK", "ORPHAN", "NULL VIOL")
    stmts.foreach { st =>
      st.trim match {
        case setRe(k, v) => vars(k) = v.trim; executed += 1
        case _ =>
          val sql = translate(SqlRunner.substitute(st, vars.toMap))
          val upper = sql.trim.toUpperCase
          try {
            val df = spark.sql(sql)
            executed += 1
            if (upper.startsWith("SELECT") || upper.startsWith("WITH")) {
              df.collect().foreach { row =>
                val m = row.schema.fieldNames.map(_.toLowerCase)
                  .zip(row.toSeq).toMap
                val name = Seq("check_name", "rule").flatMap(m.get)
                  .collectFirst { case s: String => s }.getOrElse("")
                val viol = Seq("violations", "violation_count",
                  "orphan_count", "duplicate_pk").flatMap(m.get)
                  .collectFirst { case n: Number => n.longValue }
                  .getOrElse(0L)
                if (viol > 0) {
                  val msg = s"$name: $viol"
                  if (hardClasses.exists(name.contains)) {
                    issues :+= msg; score -= 5
                  } else { warnings :+= msg; score -= 1 }
                  score = math.max(0.0, score)
                }
              }
            }
          } catch {
            case e: Exception =>
              failed += (sql.linesIterator.toSeq.headOption.getOrElse("")
                .take(80) -> String.valueOf(e.getMessage).take(200))
          }
      }
    }
    // the reference's final violations-table re-query
    // (main_etl_pipeline.py:845-852): appended to issues, no score change
    try {
      spark.sql("SELECT rule, violation_count FROM validation_violations " +
          "WHERE violation_count > 0")
        .collect().foreach(r =>
          issues :+= s"${r.get(0)}: ${r.get(1)} violations")
    } catch { case _: Exception => () }
    Outcome(stmts.size, executed, failed.result(), score, issues,
      warnings, counts)
  }
}
