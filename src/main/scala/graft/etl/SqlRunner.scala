package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — SQL script runner (main_etl_pipeline.py:825-900): executes a
  * `.sql` corpus (the reference's validation.sql shape) against Spark:
  * strips `--` line comments and `/* */` block comments, splits on `;`,
  * passes `SET` statements through to the session, collects each
  * SELECT's result.
  *
  * The reference's MySQL session variables (`SET @MIN_AGE = 13`) map to
  * Spark SQL config/variable syntax; callers can also pre-substitute
  * `@vars` via the `vars` map (the portable path).
  */
object SqlRunner {

  final case class StatementResult(index: Int, sql: String,
      result: Option[DataFrame])

  /** Strip comments and split into executable statements. Quote-aware:
    * `--`, `/&#42; &#42;/`, and `;` inside '...' or "..." literals are
    * content, not syntax (a doubled quote escapes itself inside a
    * literal), so `WHERE note = 'a;b--c'` survives intact. */
  def parse(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    val n = script.length
    var i = 0
    var quote: Char = 0 // 0 = outside any literal, else the quote char
    while (i < n) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) {
          if (i + 1 < n && script.charAt(i + 1) == quote) {
            cur += quote; i += 1 // doubled-quote escape stays in literal
          } else quote = 0
        }
        i += 1
      } else c match {
        case '\'' | '"' =>
          quote = c; cur += c; i += 1
        case '-' if i + 1 < n && script.charAt(i + 1) == '-' =>
          while (i < n && script.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && script.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n &&
            !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
          i = math.min(n, i + 2)
          cur += ' '
        case ';' =>
          out += cur.result(); cur.clear(); i += 1
        case _ =>
          cur += c; i += 1
      }
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Substitute `@name` variables with literal values. */
  def substitute(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (s, (k, v)) => s.replace(s"@$k", v) }

  /** Execute a script; SELECTs return DataFrames, DDL/SET return None. */
  def run(spark: SparkSession, script: String,
      vars: Map[String, String] = Map.empty): Seq[StatementResult] =
    parse(script).zipWithIndex.map { case (raw, i) =>
      val sql = substitute(raw, vars)
      val isQuery = sql.toLowerCase.matches("(?s)\\s*(select|with|values).*")
      val df = spark.sql(sql)
      StatementResult(i, sql, if (isQuery) Some(df) else None)
    }
}
