package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-artifact contract on Bench's emitted JSON line.
  *
  * The driver keeps only the LAST 2000 chars of stdout, and sbt's
  * trailing `[success] Total time: …` epilogue (~90 chars) sits inside
  * that window — so the whole line must stay ≤ Bench.MaxLineChars
  * (1850) or the `{"metric":…` head is cut and the driver records
  * `parsed: null`. This happened in r4 (unbudgeted queries dict) and
  * AGAIN in r7 (the 380-char `insession` dict stacked on the 1450-char
  * queries budget). This spec drives buildLine with a synthetic load
  * bigger and uglier than any real run so the budget can never regress
  * silently as the query count grows.
  */
class BenchLineSpec extends AnyFunSuite {

  // 90-char sbt epilogue inside the driver's 2000-char tail window.
  private val epilogueAllowance = 150

  private def syntheticLoad(n: Int): (Seq[(String, Double)], Map[String, Double]) = {
    // Worst-case shapes: long names (real max is ~26 chars like
    // "q48_quantile_sketch_bound") and 3-decimal values >= 100 s so
    // every fragment is as wide as the formatter can make it.
    val all = (0 until n).map { i =>
      f"x${i}%02d_very_long_query_name_pad" -> (100.0 + i + 0.123)
    }
    val first = all.map { case (k, v) => k -> (v * 4 + 0.456) }.toMap
    (all, first)
  }

  test("bench line stays under MaxLineChars with a 300-query load") {
    val (all, first) = syntheticLoad(300)
    val line = Bench.buildLine(all, first, "/root/testdata/sf0.1",
      warmSec = 1234.567, gcSec = 987.654, cpuSec = 99999.999,
      loadAvg = 31.987, wallSec = 9999.999)
    assert(line.length <= Bench.MaxLineChars,
      s"line is ${line.length} chars")
    assert(line.length + epilogueAllowance <= 2000,
      "line + sbt epilogue must fit the driver's 2000-char stdout tail")
  }

  test("bench line is valid JSON with reconstructible total") {
    val (all, first) = syntheticLoad(250)
    val line = Bench.buildLine(all, first, "/root/testdata/sf0.1",
      10.0, 2.0, 300.0, 4.5, 400.0)
    // Minimal structural checks without a JSON lib on the classpath:
    // head intact, balanced braces, the summary fields present.
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith("}"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(line.contains("\"n_done\":250"))
    assert(line.contains("\"n_omitted\":"))
    assert(line.contains("\"omitted_sec\":"))
    assert(line.contains("\"insession\":{"))
    // total = sum of all (none negative here)
    val v = line.split("\"value\":")(1).split(",")(0).toDouble
    val expect = all.map(_._2).sum
    assert(math.abs(v - expect) < 0.01)
  }

  test("failed queries (-1) are excluded from total but counted in n_done") {
    val all = Seq("a" -> 1.0, "b" -> -1.0, "c" -> 2.0)
    val line = Bench.buildLine(all, Map.empty, "sf", 0, 0, 0, 0, 0)
    assert(line.contains("\"value\":3,"))
    assert(line.contains("\"n_done\":3"))
  }
}
