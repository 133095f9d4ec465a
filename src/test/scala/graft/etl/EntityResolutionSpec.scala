package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // (source, rowId, age, gender, height, weight) — mendeley=0 < gym=1,
  // mirroring the reference's source insertion order.
  private def profiles = Seq(
    (0, 1, 25, "Male", 1.75, 70.0),
    (0, 2, 25, "male", 1.75, 70.0),   // dup of row 1 (case-insensitive)
    (0, 3, 30, "Female", 1.60, 55.5),
    (1, 4, 25, "Male", 1.751, 70.04), // rounds to same hash as row 1
    (1, 5, 40, "Male", 1.80, 90.0)
  ).toDF("src", "row_id", "age", "gender", "height", "weight")

  private def hashCol =
    EntityResolution.profileHash($"age", $"gender", $"height", $"weight")

  test("J1 profile hash rounds continuous fields") {
    val hashes = profiles.select(hashCol.as("h")).collect().map(_.getString(0))
    assert(hashes(0) == "25_male_1.75_70.0")
    assert(hashes(0) == hashes(1) && hashes(0) == hashes(3))
    assert(hashes(2) == "30_female_1.60_55.5")
  }

  test("J1 resolve dedups by hash and mints dense deterministic keys") {
    val (canonical, mapping) =
      EntityResolution.resolve(profiles, hashCol, $"src", $"row_id")
    val canon = canonical.orderBy("user_key").collect()
    assert(canon.length == 3)
    assert(canon.map(_.getAs[Long]("user_key")).toSeq == Seq(1L, 2L, 3L))
    // survivor of the 25/male group is the lowest (src, row_id) = row 1
    val surv = canonical.filter($"profile_hash" === "25_male_1.75_70.0")
      .select("row_id").collect()(0).getInt(0)
    assert(surv == 1)
    // all 5 source rows map, dup rows share the survivor's key
    assert(mapping.count() == 5)
    val keys = mapping.filter($"profile_hash" === "25_male_1.75_70.0")
      .select("user_key").distinct().collect()
    assert(keys.length == 1)
  }

  test("J1 resolve is idempotent on already-unique profiles") {
    val (canonical, _) =
      EntityResolution.resolve(profiles, hashCol, $"src", $"row_id")
    val again = EntityResolution.resolve(
      canonical.drop("user_key"), col("profile_hash"), $"src", $"row_id")._1
    assert(again.count() == canonical.count())
  }
}
