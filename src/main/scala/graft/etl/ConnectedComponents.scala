package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components via large-star / small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — the map-reduce-native CC algorithm.
  *
  * Why not min-label propagation: propagation needs one shuffle round
  * per unit of GRAPH DIAMETER — a web-scale duplicate graph has
  * chains hundreds of hops long (A≈B≈C≈… under near-dup edges), so
  * "rounds = diameter" is a scale wall. Large-star/small-star halves
  * component height every alternation and converges in O(log n)
  * rounds regardless of diameter (O(log² n) worst case in the paper;
  * ≤ 2·log₂(n) observed — pinned for a 1,024-node chain in
  * ConnectedComponentsSpec).
  *
  * Per round: two self-aggregating passes over the EDGE relation only
  * (never node×node), each one hash shuffle on the node key + one
  * broadcast-free join, then a lineage cut ([[Checkpoints.cut]] —
  * localCheckpoint by default, reliable checkpoint under
  * `graft.checkpoint.dir`). Edge count never grows above the input
  * edge count (+ n−1 star edges), so every round is bounded by the
  * input size.
  *
  * Semantics: at the fixpoint the graph is a disjoint union of stars,
  * each centered at its component's MINIMUM node id; [[run]] returns
  * one row per non-isolated node with that minimum as `cluster_id` —
  * the same contract as a recursive-CTE reachability closure.
  */
object ConnectedComponents {

  /** Node ids `(id, cluster_id)` for every node appearing in `edges`
    * (two numeric columns, either direction, self-loops ignored).
    * `maxRounds` is a safety cap — the algorithm converges in
    * O(log n) rounds; hitting the cap throws rather than returning
    * a partial clustering. */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    runCounted(edges, maxRounds)._1

  /** [[run]] plus the number of large-star/small-star rounds taken —
    * the convergence-speed contract ConnectedComponentsSpec pins. */
  def runCounted(edges: DataFrame, maxRounds: Int = 50)
      : (DataFrame, Int) = {
    val cols = edges.columns
    require(cols.length == 2,
      s"expected 2 edge columns, got ${cols.mkString(", ")}")
    var e = Checkpoints.cut(canon(
      edges.select(col(cols(0)).as("u"), col(cols(1)).as("v"))))
    var eCount = e.count()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = Checkpoints.cut(smallStar(largeStar(e)))
      // Exact set-equality fixpoint test (both relations are distinct
      // canonical pairs): equal counts + empty one-sided difference.
      // The previous round's count is carried, not recomputed.
      val nextCount = next.count()
      done = nextCount == eCount &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      // round N is materialized and the fixpoint test above was the
      // last reader of round N-1 — release its checkpoint storage
      // (files in reliable mode, blocks in local mode) so a converged
      // run doesn't leave ~rounds+1 checkpoint directories behind.
      Checkpoints.release(e)
      e = next
      eCount = nextCount
      rounds += 1
    }
    require(done, s"connected components did not converge in " +
      s"$maxRounds rounds — raise maxRounds (O(log n) expected)")
    // Fixpoint = stars centered at each component min: children carry
    // their star center, centers label themselves. No distinct needed:
    // at a fixpoint every child has exactly ONE star edge (two edges
    // into one child would change under small-star) and a center never
    // appears as a child, so the union is already one row per node.
    val labels = e.select(col("v").as("id"), col("u").as("cluster_id"))
      .unionByName(
        e.select(col("u").as("id"), col("u").as("cluster_id"))
          .distinct())
    (labels, rounds)
  }

  /** Canonical undirected edge set: (u, v) with u < v, distinct, no
    * self-loops. */
  private def canon(e: DataFrame): DataFrame =
    e.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Neighborhood minimum m(u) = min(Γ(u) ∪ {u}) over the symmetric
    * view of `e`. */
  private def nbrMin(sym: DataFrame): DataFrame =
    sym.groupBy(col("u"))
      .agg(least(min(col("v")), first(col("u"))).as("m"))

  /** Large-star: every neighbor v > u re-points to m(u). Detaches
    * large nodes from chain interiors and hangs them off local
    * minima — the height-halving half of the alternation. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(
      e.select(col("v").as("u"), col("u").as("v")))
    val m = nbrMin(sym)
    canon(sym.filter(col("v") > col("u"))
      .join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v")))
  }

  /** Small-star: every neighbor v < u, and u itself, re-point to the
    * minimum of u's small neighborhood — collapses the remaining
    * small-side chains into stars. */
  private def smallStar(e: DataFrame): DataFrame = {
    // Directed large→small view: for node u, its smaller neighbors.
    val down = e.select(col("v").as("u"), col("u").as("v"))
    val m = down.groupBy(col("u")).agg(min(col("v")).as("m"))
    canon(down.join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(m.select(col("u"), col("m").as("v"))))
  }
}
