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

  /** Strip comments and split into executable statements. */
  def parse(script: String): Seq[String] = {
    val noBlock = raw"/\*[\s\S]*?\*/".r.replaceAllIn(script, " ")
    val noLine = noBlock.linesIterator
      .map(l => l.indexOf("--") match {
        case -1 => l
        case i  => l.substring(0, i)
      })
      .mkString("\n")
    noLine.split(";").map(_.trim).filter(_.nonEmpty).toSeq
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
