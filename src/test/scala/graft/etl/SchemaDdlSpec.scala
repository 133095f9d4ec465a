package graft.etl

import graft.SparkSpec

/** S4 — the ported db_schema.sql DDL executes on Spark and the pipeline
  * output loads into the created tables (the reference's
  * create_database_schema + load_to_warehouse path,
  * main_etl_pipeline.py:714-794). */
class SchemaDdlSpec extends SparkSpec {

  test("ported DDL creates all 19 tables; pipeline output loads") {
    SchemaDdl.create(spark)
    try {
      SchemaDdl.tableNames.foreach { t =>
        assert(spark.catalog.tableExists(t), s"missing table $t")
      }
      // constraint metadata survives as table properties
      val props = spark.sql(
        "SHOW TBLPROPERTIES dim_user").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props("graft.primaryKey") == "UserKey")
      // run the demo pipeline and load its output through the DDL tables
      val res = Pipeline.run(spark, Pipeline.demoInputs(spark))
      val loaded = SchemaDdl.load(spark, res.tables)
      val expected = res.tables.filter(_._2.columns.nonEmpty)
        .map { case (n, df) => n -> df.count() }.toMap
      assert(loaded == expected)
      assert(loaded("dim_user") == 6L)
      // the loaded warehouse joins on its keys (snake→Camel alignment
      // and BIGINT casts did not break referential structure)
      val joined = spark.sql(
        """SELECT COUNT(*) FROM fact_usersnapshot f
          |JOIN dim_user u ON f.UserKey = u.UserKey
          |JOIN dim_fitnessgoal g ON f.GoalKey = g.GoalKey""".stripMargin)
        .head().getLong(0)
      assert(joined == expected("fact_usersnapshot"))
      // DDL-declared columns absent from the source are null, present
      // ones are typed per the DDL
      val snap = spark.table("fact_usersnapshot")
      assert(snap.schema("BMI").dataType.typeName == "decimal(5,2)")
      res.unpersist()
    } finally SchemaDdl.drop(spark)
  }
}
