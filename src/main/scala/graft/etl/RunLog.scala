package graft.etl

/** S8 — structured run-log sink (the reference's timed per-stage log,
  * etl_pipeline.log / main_etl_pipeline.py:14-23): one JSON line per
  * stage with name, row count, and wall seconds, to stderr and
  * optionally a file. Driver-side and tiny by design — counting rows
  * forces a job, so stages opt in by passing `rows` (the reference logs
  * `len(df)` per stage for the same cost).
  */
final class RunLog(path: Option[String] = None) {

  private val t0 = System.nanoTime()
  private val lines = Seq.newBuilder[String]

  private def esc(s: String) =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Record one stage; returns the message for chaining/tests. */
  def stage(name: String, rows: Long = -1L,
      detail: String = ""): String = {
    val t = (System.nanoTime() - t0) / 1e9
    val line = f"""{"stage":"${esc(name)}","t_sec":$t%.3f""" +
      (if (rows >= 0) s""","rows":$rows""" else "") +
      (if (detail.nonEmpty) s""","detail":"${esc(detail)}"""" else "") +
      "}"
    lines += line
    System.err.println(s"[etl] $line")
    line
  }

  /** Time a stage around a thunk. */
  def timed[T](name: String)(body: => T): T = {
    val s = System.nanoTime()
    val out = body
    val t = (System.nanoTime() - s) / 1e9
    stage(name, detail = f"$t%.3fs")
    out
  }

  /** Flush collected lines to the configured file (JSON lines). */
  def close(): Unit = path.foreach { p =>
    graft.sources.Sources.writeJsonReport(
      lines.result().mkString("\n"), p)
  }
}
