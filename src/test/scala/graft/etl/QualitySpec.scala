package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("rules count violations and score applies -5/-1 with floor") {
    val t = Seq((1, Some(10.0)), (1, Some(200.0)), (2, None))
      .toDF("id", "v")
    val dim = Seq(1).toDF("k")
    val rules = Seq(
      Quality.Rule("pk unique", Quality.Issue,
        Quality.pkUniqueness(Seq(col("id")))),
      Quality.Rule("fk orphan", Quality.Issue,
        Quality.fkOrphans(dim, "id", "k")),
      Quality.Rule("v not null", Quality.Issue,
        Quality.nullViolations("v")),
      Quality.Rule("v in [0,100]", Quality.Warning,
        Quality.rangeViolations("v", 0, 100)))
    val r = Quality.run(t, rules)
    assert(r.results.map(_.violations).toSeq == Seq(1, 1, 1, 1))
    assert(r.issues == 3 && r.warnings == 1)
    assert(r.score == 100.0 - 15.0 - 1.0)
    val json = Quality.toJson(r)
    assert(json.contains("\"quality_score\":84.0"))
    assert(json.contains("\"rule\":\"pk unique\""))
  }

  test("clean table scores 100") {
    val t = Seq((1, 5.0), (2, 6.0)).toDF("id", "v")
    val r = Quality.run(t, Seq(
      Quality.Rule("pk unique", Quality.Issue,
        Quality.pkUniqueness(Seq(col("id")))),
      Quality.Rule("v in [0,100]", Quality.Warning,
        Quality.rangeViolations("v", 0, 100))))
    assert(r.score == 100.0)
  }
}
