package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable query id (keyed to SURVEY.md §2 operator ids)
  * @param oracle equivalent ANSI SQL for the DuckDB oracle over the same
  *               parquet tables; None for non-SQL-expressible operators
  *               (driver then records a weaker rows-only check)
  * @param run    the Spark implementation; second arg is the sf directory
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
