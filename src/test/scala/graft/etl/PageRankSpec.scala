package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergence contract for the PageRank library (x59's kernel): on a
  * graph that 3 fixed iterations provably do NOT settle, the
  * iterate-with-cut loop runs until the ranks are stable, keeps plan
  * depth constant across rounds, and lands on exactly the ranks the
  * unrolled form computes for the same round count (the cut changes
  * the plan, never a bit of the data).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Tol = 1000000000L // 1e9 micro-units of the 1e12 mass

  /** 32-node chain, symmetrized: end nodes (deg 1) and interior nodes
    * (deg 2) pull rank apart slowly — the slow-mixing shape where a
    * fixed 3-iteration run is far from the stationary distribution. */
  private def chain = {
    val pairs = (0L until 31L).map(i => (i, i + 1)).toDF("u", "v")
    pairs.unionByName(pairs.select($"v".as("u"), $"u".as("v")))
  }

  test("chain graph: 3 iterations have NOT converged; the loop finishes the job") {
    val g = PageRank.graph(chain)
    // after 3 fixed rounds the next step still moves ranks well past
    // the tolerance — the premise that makes runConverged necessary
    val r3 = PageRank.runFixed(g, 3)
    val d3 = PageRank.step(g)(r3)
      .join(r3.withColumnRenamed("rank", "prev"), Seq("node"))
      .agg(max(abs($"rank" - $"prev"))).first().getLong(0)
    assert(d3 > Tol, s"3 rounds already converged (delta $d3) — " +
      "the spec graph no longer exercises the loop")

    val (r, rounds) = PageRank.runConverged(g, Tol)
    assert(rounds > 3, s"converged in $rounds rounds")

    // rank stability at the cut: one more step moves nothing past Tol
    val dNext = PageRank.step(g)(r)
      .join(r.withColumnRenamed("rank", "prev"), Seq("node"))
      .agg(max(abs($"rank" - $"prev"))).first().getLong(0)
    assert(dNext <= Tol)

    // the cut changes the plan, never the data: the unrolled form at
    // the same round count lands on the identical BIGINT ranks
    val unrolled = PageRank.runFixed(g, rounds)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val looped = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(looped == unrolled)

    // integer mass accounting: floors only shave, never redistribute
    val mass = r.agg(sum($"rank")).first().getLong(0)
    assert(mass <= PageRank.Scale && mass > PageRank.Scale * 95 / 100)
  }

  test("plan depth stays constant across rounds (the cut is load-bearing)") {
    val g = PageRank.graph(chain)
    val (r, rounds) = PageRank.runConverged(g, Tol)
    assert(rounds > 3)
    // after N rounds the returned frame's plan must be a checkpoint
    // scan, not an N-deep join tree — the property that keeps analysis
    // cost flat however long a big graph takes to converge
    val planLines = r.queryExecution.optimizedPlan.toString
      .linesIterator.size
    assert(planLines <= 5,
      s"converged plan is $planLines lines deep — lineage not cut")
  }
}
