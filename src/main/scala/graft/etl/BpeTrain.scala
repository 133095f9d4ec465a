package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full BPE tokenizer training: x61's one-merge-step kernel iterated K
  * rounds under the engine's iterate-with-cut discipline
  * ([[PageRank.runConverged]] is the template — checkpoint per round,
  * release superseded rounds, ONE bounded driver action per round), so
  * plan depth stays CONSTANT in K and the loop is safe at any merge
  * count (real tokenizers run 30k–100k merges; an unrolled plan nests
  * round N-1 inside round N and dies in Catalyst analysis long before
  * that).
  *
  * Semantics per round are exactly x61's, oracle-gated there and
  * re-gated as a K-round composition by x89's expanded-SQL oracle:
  * global byte-pair statistics over the (word, freq) DISTINCT-WORD
  * vocabulary (cost ∝ vocab size, not corpus size — the classic BPE
  * trick), argmax merge on the (cnt desc, sym_a, sym_b) total order,
  * greedy leftmost non-overlapping application via the parity-within-
  * islands window computation (no per-word loop, no UDF), then a
  * row_number RENUMBER of each word's surviving symbols — consecutive
  * positions are what keep the next round's island grouping correct
  * after merges punch holes in the sequence.
  *
  * The per-round driver action is the 1-row argmax collect (the merge
  * table is driver-sized BY DEFINITION — K rows is the tokenizer
  * artifact being trained); everything corpus-shaped stays
  * distributed. BpeTrainSpec pins loop ≡ hand-computed merges and the
  * constant-plan-depth property.
  */
object BpeTrain {

  /** One trained merge: rank (1-based), the merged pair, its count at
    * selection time. */
  final case class Merge(merge_rank: Long, sym_a: String, sym_b: String,
      cnt: Long)

  /** (word, freq) vocabulary from a documents table — whitespace
    * tokenization, x61's contract. */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol relation: one row per character occurrence,
    * (word, freq, pos, sym) with consecutive 0-based positions. */
  def symbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      posexplode(expr("filter(split(word, ''), ch -> ch <> '')"))
        .as(Seq("pos", "sym")))

  private val wW = Window.partitionBy(col("word")).orderBy(col("pos"))

  /** Frequency-weighted adjacent-pair counts of a symbol relation. */
  def pairCounts(syms: DataFrame): DataFrame = syms
    .withColumn("nxt", lead(col("sym"), 1).over(wW))
    .filter(col("nxt").isNotNull)
    .select(col("sym").as("sym_a"), col("nxt").as("sym_b"), col("freq"))
    .groupBy(col("sym_a"), col("sym_b"))
    .agg(sum(col("freq")).as("cnt"))

  /** Apply one merge (ma, mb) with greedy leftmost non-overlapping
    * semantics and renumber the surviving symbols to consecutive
    * positions (x61's parity-within-islands windows + one renumber
    * window). */
  def applyMerge(syms: DataFrame, ma: String, mb: String): DataFrame = {
    val flagged = syms
      .withColumn("nxt", lead(col("sym"), 1).over(wW))
      .withColumn("m", col("sym") === lit(ma) && col("nxt") === lit(mb))
    val wG = Window.partitionBy(col("word"), col("grp"))
    val applied = flagged.filter(col("m"))
      .withColumn("grp", col("pos") - row_number().over(wW))
      .withColumn("head", min(col("pos")).over(wG))
      .filter((col("pos") - col("head")) % 2 === 0)
      .select(col("word"), col("pos"))
    val consumed = applied.select(col("word"), (col("pos") + 1).as("pos"))
    flagged
      .join(applied.withColumn("ap", lit(true)), Seq("word", "pos"),
        "left")
      .join(consumed.withColumn("gone", lit(true)), Seq("word", "pos"),
        "left")
      .filter(col("gone").isNull)
      .select(col("word"), col("freq"),
        row_number().over(wW).as("pos"),
        when(col("ap"), concat(lit(ma), lit(mb)))
          .otherwise(col("sym")).as("sym"))
  }

  /** Train `k` merges over a (word, freq) vocabulary. Returns the merge
    * table (≤ k entries — fewer iff the pair statistics run dry first)
    * and the final symbol relation (itself a flat checkpoint scan —
    * constant plan depth regardless of k). */
  def train(words: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var syms = Checkpoints.cut(symbols(words))
    val merges = Seq.newBuilder[Merge]
    var round = 1
    var dry = false
    while (round <= k && !dry) {
      // one driver action per round: the 1-row argmax of the pair stats
      val top = pairCounts(syms)
        .orderBy(desc("cnt"), col("sym_a"), col("sym_b")).limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (ma, mb, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(round.toLong, ma, mb, cnt)
        val next = Checkpoints.cut(applyMerge(syms, ma, mb))
        Checkpoints.release(syms) // the argmax + apply were its last readers
        syms = next
        round += 1
      }
    }
    (merges.result(), syms)
  }
}
