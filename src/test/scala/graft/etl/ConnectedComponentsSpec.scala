package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness + convergence-speed contract for the
  * large-star/small-star connected-components operator.
  *
  * The headline pin: a 1,024-node CHAIN — the worst case for min-label
  * propagation (1,023 rounds = the diameter) — must converge in at
  * most 2·log₂(n) alternation rounds. That bound is the entire reason
  * the operator exists; if a future edit regresses it back toward
  * diameter-proportional rounds, this spec fails before a bench does.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth by driver-side union-find (test-only, tiny inputs). */
  private def unionFind(n: Int, edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("1024-node chain: exact labels in <= 2*log2(n) rounds") {
    val n = 1024
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val (labels, rounds) = ConnectedComponents.runCounted(
      edges.toDF("a", "b"))
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L),
      "every chain node must label to the minimum (0)")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound,
      s"chain of $n took $rounds rounds; O(log n) contract is <= $bound")
  }

  test("matches union-find on a multi-component graph with merges") {
    // Three components assembled so closure is genuinely transitive:
    // a chain, a star rooted at a HIGH id (forces re-rooting to the
    // min), and two rings bridged by one edge; plus an isolated pair.
    val edges: Seq[(Long, Long)] =
      (100L to 110L).sliding(2).map(s => (s(1), s(0))).toSeq ++
        Seq(900L -> 210L, 900L -> 205L, 900L -> 203L, 203L -> 201L) ++
        (300L to 304L).map(i => (i, if (i == 304) 300L else i + 1)) ++
        (400L to 404L).map(i => (i, if (i == 404) 400L else i + 1)) ++
        Seq(302L -> 402L) ++
        Seq(500L -> 501L)
    val want = unionFind(0, edges)
    val got = ConnectedComponents.run(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("duplicate, reversed, and self-loop edges do not disturb it") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 4L))
    val got = ConnectedComponents.run(edges.toDF("x", "y"))
      .as[(Long, Long)].collect().toMap
    // 3's only edge is a self-loop -> not a member of any edge set.
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("x11 stays green against its own contract at sf0.001") {
    // The operator's production consumer: same output as before the
    // propagation->star rewrite (spot-check the planted generations:
    // d, d+1M, d+2M must share a cluster through d).
    val out = graft.SparkEntry.queries("x11_dup_clusters")(spark, sf)
    val m = out.as[(Long, Long)].collect().toMap
    val planted = m.keys.filter(_ >= 1000000L)
    assert(planted.nonEmpty, "corpus must contain planted duplicates")
    planted.foreach { d =>
      val base = d % 1000000L
      assert(m(d) == m(base),
        s"planted dup $d must share a cluster with base $base")
    }
  }
}
