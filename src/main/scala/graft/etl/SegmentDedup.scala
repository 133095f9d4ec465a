package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level exact dedup across a corpus — the "line dedup" stage
  * of web-scrape pipelines (strip boilerplate headers/footers/nav text
  * that repeats across many pages) generalized over the segmentation:
  * newline-split lines on a real corpus, fixed word windows on corpora
  * without line structure.
  *
  * Plan shape: explode to (doc, pos, segment) → one shuffle on
  * segment text to find segments whose document frequency exceeds
  * `maxDf` (the hot side is the df-filtered minority, so AQE
  * broadcasts the subsequent membership join) → one shuffle back on
  * doc id to reassemble kept segments in position order. Nothing is
  * ever pairwise: cost is linear in total segments at any corpus
  * size.
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
    val segs = docs.select(col(idCol),
      posexplode(segments).as(Seq("seg", "seg_text")))
    val hot = segs.groupBy(col("seg_text"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("seg_text"), lit(true).as("__hot"))
    segs.join(hot, Seq("seg_text"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__hot").isNull,
            struct(col("seg"), col("seg_text"))))),
          x => x.getField("seg_text"))).as("clean_text"),
        count(lit(1)).as("n_segments"),
        count(col("__hot")).as("n_dropped"))
  }
}
