package graft

/** Smoke coverage: every declared query runs on sf0.001 and returns a
  * sane, non-degenerate result. (Value-level correctness is enforced by
  * the driver's DuckDB oracle; tools/selfcheck.py replicates it locally.)
  */
class QueriesSpec extends SparkSpec {

  // queries whose correct result CAN be empty on clean data
  private val mayBeEmpty = Set("q01_catalog_antijoin")

  SparkEntry.defs.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sf)
      val n = df.count()
      if (!mayBeEmpty.contains(q.name)) assert(n > 0, s"${q.name} empty")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length,
        s"${q.name} has duplicate column names")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query names are unique (duplicates would collapse in the map)") {
    val names = SparkEntry.defs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }
}
