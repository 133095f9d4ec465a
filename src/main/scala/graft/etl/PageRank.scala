package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer PageRank — the library form of the x59 query kernel.
  *
  * Ranks live in micro-units of a fixed total mass ([[Scale]]): each
  * node's per-edge contribution is `(rank · 85) div (100 · deg)` and
  * the damping base is the constant `(15% · Scale) div (100 · N)`, so
  * the whole computation is BIGINT arithmetic — partial-sum order
  * cannot perturb a single bit, and any engine (or any partitioning)
  * produces identical ranks. Floor losses shave total mass
  * deterministically; they never redistribute it.
  *
  * Two run modes over the same [[step]]:
  *  - [[runFixed]] — N unrolled power iterations, no lineage cut: the
  *    x59 oracle gate's shape (a 3-deep join/agg plan Catalyst sees
  *    whole).
  *  - [[runConverged]] — iterate-with-cut until the max per-node rank
  *    delta drops to `tolMicro`, the ConnectedComponents discipline: a
  *    [[Checkpoints.cut]] per round keeps plan depth CONSTANT however
  *    many rounds convergence takes (without it, round k replans a
  *    k-deep join tree — analysis cost grows quadratically and the
  *    driver OOMs long before a big graph converges), and the previous
  *    round's checkpoint storage is released once its last reader (the
  *    delta test) is done. The per-round convergence action is one
  *    1-row aggregate.
  *
  * Per iteration: one join against the degree relation + one
  * groupBy-on-dst shuffle — the Pregel shape. Never node×node.
  */
object PageRank {

  /** Total rank mass: 1e12 micro-units. */
  val Scale = 1000000000000L

  /** A prepared graph: symmetric edge relation (u, v) with lineage
    * cut, out-degrees, node count, and the constant damping base. */
  final case class Graph(edges: DataFrame, deg: DataFrame, n: Long,
      base: Long)

  import Checkpoints.CutOps

  /** Prepare a SYMMETRIC (u, v) edge relation (both directions
    * present, as x59 builds it) for iteration: cut the edge lineage
    * (every round re-reads it), derive out-degrees, count nodes once
    * (catalog stats at real scale), fix the damping base. */
  def graph(edges0: DataFrame): Graph = {
    val edges = edges0.cut(false) // consumed by deg + every iteration
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .cut(false)
    val n = deg.count()
    Graph(edges, deg, n, Scale * 15L / (100L * n))
  }

  /** Uniform start: every node gets `Scale div n`. */
  def init(g: Graph): DataFrame =
    g.deg.select(col("u").as("node"), lit(Scale / g.n).as("rank"))

  /** One exact power iteration of `r`(node, rank). */
  def step(g: Graph)(r: DataFrame): DataFrame =
    g.edges.join(g.deg, Seq("u"))
      .join(r.withColumnRenamed("node", "u"), Seq("u"))
      .select(col("v").as("node"),
        expr("(rank * 85) div (100 * deg)").as("c"))
      .groupBy(col("node"))
      .agg((sum(col("c")) + lit(g.base)).as("rank"))

  /** `iters` unrolled iterations — the x59 gate's fixed form. */
  def runFixed(g: Graph, iters: Int): DataFrame =
    (1 to iters).foldLeft(init(g))((r, _) => step(g)(r))

  /** Iterate with a lineage cut per round until the max per-node
    * |Δrank| is ≤ `tolMicro` micro-units; returns the converged ranks
    * and the round count. Plan depth stays constant across rounds and
    * each superseded round's checkpoint storage is released, so the
    * loop is safe at any convergence horizon. Throws if `maxRounds`
    * is exhausted rather than returning half-mixed ranks. */
  def runConverged(g: Graph, tolMicro: Long, maxRounds: Int = 200)
      : (DataFrame, Int) = {
    var r = Checkpoints.cut(init(g))
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = Checkpoints.cut(step(g)(r))
      // one 1-row action per round: the largest per-node movement
      val delta = next
        .join(r.withColumnRenamed("rank", "prev"), Seq("node"))
        .agg(max(abs(col("rank") - col("prev"))).as("d"))
        .first().getLong(0)
      done = delta <= tolMicro
      Checkpoints.release(r) // the delta test was its last reader
      r = next
      rounds += 1
    }
    require(done, s"PageRank did not converge to $tolMicro " +
      s"micro-units in $maxRounds rounds")
    (r, rounds)
  }
}
