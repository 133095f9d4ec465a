package graft

/** x53's reason to exist is the JL concentration property: squared
  * distances survive the 64-d → 16-d Rademacher projection to within
  * a bounded ratio. The oracle pins the exact cells; this spec pins
  * the STATISTICS a broken sign family would wreck (the original
  * single-multiply mix produced rows with |corr| up to 0.94 and blew
  * the ratio spread to [0.07, 7.8] — caught by exactly these checks).
  */
class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ratios: Array[Double] =
    SparkEntry.queries("x53_jl_projection")(spark, sf)
      .select("d2_ratio").na.drop().as[Double].collect()

  test("projection is unbiased: mean ratio near 1") {
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }

  test("ratios concentrate: most pairs within ±0.5 of 1") {
    val within = ratios.count(r => r >= 0.5 && r <= 1.5)
    val frac = within.toDouble / ratios.length
    assert(frac >= 0.7, s"only $within/${ratios.length} within bound")
  }

  test("no catastrophic distortion from correlated projection rows") {
    assert(ratios.max < 4.0, s"max ratio ${ratios.max}")
    assert(ratios.min > 0.1, s"min ratio ${ratios.min}")
  }
}
