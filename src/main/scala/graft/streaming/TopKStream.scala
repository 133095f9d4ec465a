package graft.streaming

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: running top-k tokens over an unbounded
  * token stream with BOUNDED state, via sharded SpaceSaving sketches
  * (see [[graft.functions.SpaceSavingTopK]] for the sketch itself).
  *
  * Design for a 1000-executor cluster:
  *   - tokens are keyed by `hash(token) mod shards` — each shard's
  *     sketch lives in the state store on whichever executor owns that
  *     key, so state is distributed, checkpointed, and fixed-size
  *     (`shards × capacity` slots TOTAL, independent of the domain);
  *   - because shards PARTITION the token domain, any globally-top-k
  *     token is top-k within its own shard — emitting k candidates per
  *     shard per trigger and exact-merging the ≤ shards×k survivors
  *     downstream (driver-side or one tiny final agg) never misses a
  *     true heavy hitter whose shard sketch retained it;
  *   - the per-shard update folds the micro-batch through the SAME
  *     reduce/merge code the batch aggregator uses — one tested kernel,
  *     two execution modes.
  *
  * This is the streaming twin of `x22_heavy_hitters`; the spec feeds
  * both paths the same stream and asserts the snapshot merge equals the
  * exact batch top-k.
  */
object TopKStream {

  final case class Tok(shard: Int, tok: String)
  final case class Candidate(shard: Int, tok: String, cnt: Long, err: Long)

  /** Shard a raw text stream into (shard, token) rows — same
    * tokenization as x22. */
  def tokens(texts: Dataset[String], shards: Int): Dataset[Tok] = {
    import texts.sparkSession.implicits._
    // normalize the single column's name — a Dataset[String] keeps
    // whatever name its source column had
    texts.toDF("value")
      .select(explode(split(lower(col("value")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(pmod(hash(col("tok")), lit(shards)).as("shard"), col("tok"))
      .as[Tok]
  }

  /** Per-shard stateful update: fold the micro-batch's tokens into the
    * shard's sketch, emit the shard's current top-k candidates. Pure —
    * unit-testable without a streaming query. */
  def step(agg: SpaceSavingTopK)(shard: Int, toks: Iterator[Tok],
      state: GroupState[Map[String, (Long, Long)]]): Iterator[Candidate] = {
    val sketch = toks.foldLeft(state.getOption.getOrElse(agg.zero)) {
      (buf, t) => agg.reduce(buf, t.tok)
    }
    state.update(sketch)
    agg.finish(sketch).iterator.map { case (tok, c, e) =>
      Candidate(shard, tok, c, e)
    }
  }

  /** Wire the stateful operator over a (possibly streaming) token set.
    * Output: each trigger's per-shard top-k candidate rows (Update
    * mode — downstream keeps the latest row per (shard, tok)). */
  def candidates(toks: Dataset[Tok], capacity: Int, k: Int)
      : Dataset[Candidate] = {
    import toks.sparkSession.implicits._
    val agg = new SpaceSavingTopK(capacity, k)
    toks.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step(agg))
  }

  /** Exact final merge of the latest candidate snapshot: global top-k
    * by (count desc, token asc) — ≤ shards×k rows in, k out, so this
    * stage is trivially small at any scale. */
  def mergeSnapshot(spark: SparkSession, snapshot: Dataset[Candidate],
      k: Int): Dataset[(String, Long)] = {
    import spark.implicits._
    snapshot.groupBy("tok").agg(max("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(k)
      .as[(String, Long)]
  }
}
