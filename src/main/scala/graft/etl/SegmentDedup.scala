package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level exact dedup across a corpus — the "line dedup" stage
  * of web-scrape pipelines (strip boilerplate headers/footers/nav text
  * that repeats across many pages) generalized over the segmentation:
  * newline-split lines on a real corpus, fixed word windows on corpora
  * without line structure.
  *
  * Plan shape: no shuffle ever carries segment text. The segment
  * array is hashed row-locally (xxhash64 per segment), only the
  * (doc, pos, hash64) triples shuffle for the document-frequency
  * aggregate, the hot keys (df > maxDf) are the filtered minority
  * (AQE broadcasts them into the membership join), and the dropped
  * POSITIONS per doc — another small aggregate — join back to the
  * one-row-per-doc side, where the original array is filtered in
  * place. The reassembly is a row-local array `filter`, not a
  * regroup, so original order is free. 64-bit collision risk is the
  * standard accepted trade of hash-keyed line dedup. Nothing is ever
  * pairwise: cost is linear in total segments at any corpus size.
  */
object SegmentDedup {

  /** Fixed-width word-window segmentation (for corpora without
    * newline structure): windows of `w` space-separated words. */
  def wordWindows(text: Column, w: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(0), ceil(size(words) / lit(w.toDouble)).cast("long")
        - 1),
      i => array_join(
        slice(words, (i * w + 1).cast("int"), lit(w)), " "))
  }

  /** Newline-line segmentation (the classic web-corpus case). */
  def lines(text: Column): Column = split(text, "\n")

  /** Remove segments that occur in more than `maxDf` distinct
    * documents. Returns one row per doc: `idCol`, `clean_text` (kept
    * segments joined by `sep` in original order), `n_segments`,
    * `n_dropped`. */
  def clean(docs: DataFrame, idCol: String, segments: Column,
      maxDf: Int = 1, sep: String = " "): DataFrame = {
    // One row per doc carrying the segment array; docs with no
    // segments are absent from the output (same as the explode the
    // previous implementation was built on).
    val withSegs = docs.select(col(idCol), segments.as("__segs"))
      .filter(size(col("__segs")) > 0)
    // Only (doc, pos, hash) shuffles — never the text.
    val segKeys = withSegs.select(col(idCol),
      posexplode(transform(col("__segs"), x => xxhash64(x)))
        .as(Seq("seg", "__k")))
    val hot = segKeys.groupBy(col("__k"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__k"))
    // Positions of hot segments per doc: the inner join keeps only the
    // hot minority, so this aggregate output is small relative to the
    // corpus and AQE broadcasts it into the final doc-side join.
    val dropped = segKeys.join(hot, Seq("__k"))
      .groupBy(col(idCol))
      .agg(collect_set(col("seg")).as("__drop"),
        count(lit(1)).as("__n_dropped"))
    withSegs.join(dropped, Seq(idCol), "left")
      .select(col(idCol),
        concat_ws(sep, filter(col("__segs"), (x, i) =>
          !coalesce(exists(col("__drop"), e => e === i), lit(false))))
          .as("clean_text"),
        size(col("__segs")).cast("long").as("n_segments"),
        coalesce(col("__n_dropped"), lit(0L)).as("n_dropped"))
  }
}
