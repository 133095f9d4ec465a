package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The training-loop contract for [[BpeTrain]] (x89's engine): merges
  * follow exact BPE semantics round over round on a hand-computable
  * vocabulary (greedy leftmost non-overlap INCLUDED — the "aaa" case),
  * and the loop keeps plan depth constant in K (iterate-with-cut), the
  * property that makes a 50k-merge training run plannable at all.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("K merges match the hand-computed BPE trace (overlap rule included)") {
    // vocab: "aaa" x2, "ab" x1
    // round 1 pairs: (a,a) cnt 4 (two adjacent pairs in "aaa", freq 2),
    //   (a,b) cnt 1 -> merge (a,a); "aaa" -> [aa, a] (greedy leftmost:
    //   positions {0,1} match, only 0 applies)
    // round 2 pairs: (aa,a) cnt 2, (a,b) cnt 1 -> merge (aa,a)
    // round 3 pairs: (a,b) cnt 1 -> merge (a,b)
    val words = Seq(("aaa", 2L), ("ab", 1L)).toDF("word", "freq")
    val (merges, syms) = BpeTrain.train(words, 3)
    assert(merges.map(m => (m.merge_rank, m.sym_a, m.sym_b, m.cnt)) ==
      Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L), (3L, "a", "b", 1L)))
    // final symbols: "aaa" fully merged, "ab" merged
    val finalSyms = syms.select("word", "pos", "sym").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(finalSyms == Set(("aaa", 1, "aaa"), ("ab", 1, "ab")))
  }

  test("training runs dry gracefully when fewer than K pairs exist") {
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val (merges, _) = BpeTrain.train(words, 10)
    // one merge exhausts every adjacent pair
    assert(merges.map(m => (m.sym_a, m.sym_b)) == Seq(("a", "b")))
  }

  test("plan depth is constant in K: the final relation is a checkpoint scan") {
    val words = Seq(("abcabcabc", 3L), ("bcbc", 2L), ("cab", 1L))
      .toDF("word", "freq")
    val (_, s3) = BpeTrain.train(words, 3)
    val (_, s6) = BpeTrain.train(words, 6)
    def planLines(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.toString.linesIterator.size
    // both are flat scans of their checkpoint, not K-deep window trees
    assert(planLines(s3) <= 5 && planLines(s6) <= 5,
      s"plan grew with K: ${planLines(s3)} vs ${planLines(s6)} lines")
  }
}
