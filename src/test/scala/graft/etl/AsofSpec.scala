package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    ("AAA", ts("2024-01-01 10:00:00"), 100.0, "early"),
    ("AAA", ts("2024-01-01 10:00:05"), 101.0, "late"),
    ("BBB", ts("2024-01-01 10:00:03"), 50.0, "only"))
    .toDF("sym", "qts", "px", "tag")

  private val trades = Seq(
    ("AAA", ts("2024-01-01 10:00:04"), 1L), // between the two quotes
    ("AAA", ts("2024-01-01 10:00:05"), 2L), // exactly at the late quote
    ("BBB", ts("2024-01-01 10:00:01"), 3L), // before any quote
    ("CCC", ts("2024-01-01 10:00:09"), 4L)) // key with no quotes at all
    .toDF("sym", "tts", "trade_id")

  test("latest at-or-before match per key; exact ts ties match") {
    val out = Asof.join(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.getAs[java.sql.Timestamp]("asof_ts"))
        .map(_.toString)).toSeq ==
      Seq(Some("2024-01-01 10:00:00.0"), Some("2024-01-01 10:00:05.0"),
        None, None))
    assert(out(0).getAs[Double]("asof_px") == 100.0)
    assert(out(1).getAs[Double]("asof_px") == 101.0)
    // left payload passes through untouched
    assert(out.map(_.getAs[Long]("trade_id")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("matched right row is whole-row consistent (struct carry)") {
    // the later quote has a NULL tag: a per-column carry-forward would
    // stitch the older row's tag onto the newer row's price
    val q = Seq(("AAA", ts("2024-01-01 10:00:00"), 100.0, "early"),
        ("AAA", ts("2024-01-01 10:00:05"), 101.0,
          null.asInstanceOf[String]))
      .toDF("sym", "qts", "px", "tag")
    val t = Seq(("AAA", ts("2024-01-01 10:00:06"), 1L))
      .toDF("sym", "tts", "trade_id")
    val r = Asof.join(t, q, Seq("sym"), "tts", "qts").collect()(0)
    assert(r.getAs[Double]("asof_px") == 101.0)
    assert(r.isNullAt(r.fieldIndex("asof_tag")))
  }

  test("tolerance nulls out stale matches") {
    val out = Asof.join(trades, quotes, Seq("sym"), "tts", "qts",
        toleranceUs = Some(1000000L)) // 1 s
      .orderBy("trade_id").collect()
    // trade 1 is 4 s after the early quote → stale; trade 2 is exact
    assert(out(0).isNullAt(out(0).fieldIndex("asof_px")))
    assert(out(1).getAs[Double]("asof_px") == 101.0)
  }

  test("forward direction: earliest at-or-after match per key") {
    val out = Asof.joinForward(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("trade_id").collect()
    // trade 1 (10:00:04) → next AAA quote 10:00:05; trade 2 exact-ts
    // tie matches the 10:00:05 quote itself; trade 3 (10:00:01) →
    // BBB's 10:00:03; trade 4 has no quotes at all
    assert(out.map(r => Option(r.getAs[java.sql.Timestamp]("asof_ts"))
        .map(_.toString)).toSeq ==
      Seq(Some("2024-01-01 10:00:05.0"), Some("2024-01-01 10:00:05.0"),
        Some("2024-01-01 10:00:03.0"), None))
    assert(out(0).getAs[Double]("asof_px") == 101.0)
    assert(out(2).getAs[Double]("asof_px") == 50.0)
  }

  test("forward tolerance bounds how far ahead a match may be") {
    val out = Asof.joinForward(trades, quotes, Seq("sym"), "tts", "qts",
        toleranceUs = Some(1000000L)) // 1 s
      .orderBy("trade_id").collect()
    // trade 1 → +1 s ahead: kept; trade 3 → +2 s ahead: nulled
    assert(out(0).getAs[Double]("asof_px") == 101.0)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_px")))
  }
}
