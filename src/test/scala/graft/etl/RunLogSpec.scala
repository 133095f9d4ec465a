package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class RunLogSpec extends AnyFunSuite {

  test("emits one JSON line per stage and flushes to file") {
    val f = java.nio.file.Files.createTempFile("runlog", ".jsonl")
    val log = new RunLog(Some(f.toString))
    val l1 = log.stage("extract_fitbit", rows = 457)
    assert(l1.contains(""""stage":"extract_fitbit""""))
    assert(l1.contains(""""rows":457"""))
    val out = log.timed("transform")(21 * 2)
    assert(out == 42)
    log.stage("""weird "name"""", detail = "a\\b")
    log.close()
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size() == 3)
    lines.forEach { l =>
      assert(l.startsWith("{") && l.endsWith("}"))
      assert(l.contains(""""t_sec":"""))
    }
    // escaped quotes/backslashes stay valid JSON
    assert(lines.get(2).contains("""weird \"name\""""))
  }
}
