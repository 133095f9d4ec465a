package graft

import org.apache.spark.sql.Row

/** The property x52 exists to demonstrate: under min/max envelope
  * skipping, a Z-order layout prunes a 2-D box on BOTH dimensions
  * while the 1-D sorted layout prunes only its own — so for the
  * center-half box, Z-order's scan fraction must land near ¼ and
  * strictly beat linear's ~½. (The exact cells are pinned by the
  * DuckDB oracle; this spec pins the INEQUALITY the layout decision
  * rests on, so a future edit can't quietly invert it.)
  */
class ZorderLayoutSpec extends SparkSpec {

  private lazy val rows: Map[String, Row] =
    SparkEntry.queries("x52_zorder_layout")(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap

  test("z-order scans strictly fewer rows than the 1-D sort") {
    val lin = rows("linear").getAs[Double]("scan_frac")
    val zo = rows("zorder").getAs[Double]("scan_frac")
    assert(zo < lin, s"zorder $zo !< linear $lin")
    // linear prunes its own dim only: ~half the rows survive
    assert(lin > 0.4 && lin < 0.6, s"linear scan_frac $lin")
    // z-order prunes both dims: ~quarter + bucket-boundary slop
    assert(zo < 0.35, s"zorder scan_frac $zo")
  }

  test("both layouts cover every row exactly once") {
    val n = Tables.lineitem(spark, sf).count()
    assert(rows("linear").getAs[Long]("n_rows") === n)
    assert(rows("zorder").getAs[Long]("n_rows") === n)
  }
}
