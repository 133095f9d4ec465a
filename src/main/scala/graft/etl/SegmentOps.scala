package graft.etl

import org.apache.spark.sql.DataFrame

/** The one composition rule every log-structured index family shares:
  * base ∪ segment additions under SCOPED tombstones — segment i's
  * tombstones mask the base and additions j < i, never later ones, so
  * deleting a document and re-appending its revision in a later
  * segment is correct by construction (the delete-then-revise chain
  * each family's spec pins). [[SparseSegments]] layers term-level
  * repair on top; the dense ([[PqSegments]]) and MinHash
  * ([[MinHashSegments]]) families' stored rows are per-document, so
  * this rule alone IS their live view.
  */
object SegmentOps {

  /** base ∪ adds(i), with tombs(i) masking base and adds(j < i) on
    * `key`. `adds` and `tombs` are parallel per-segment sequences (an
    * append segment has empty tombs; a delete segment an empty add). */
  def scopedUnion(base: DataFrame, adds: Seq[DataFrame],
      tombs: Seq[DataFrame], key: String): DataFrame = {
    require(adds.size == tombs.size,
      "scopedUnion: adds/tombs must be parallel per-segment sequences")
    def masked(df: DataFrame, ts: Seq[DataFrame]): DataFrame =
      ts.foldLeft(df)((acc, t) =>
        acc.join(t.select(key), Seq(key), "left_anti"))
    adds.zipWithIndex
      .map { case (a, i) => masked(a, tombs.drop(i + 1)) }
      .foldLeft(masked(base, tombs))(_ unionByName _)
  }

  /** A statically-EMPTY relation with `df`'s schema (a LocalRelation
    * with no rows — not a `limit(0)` over a real plan). The
    * difference matters for plan cost: Catalyst's empty-relation
    * propagation ELIDES joins against a provably-empty side, so an
    * append segment's vacuous tombstones (or a delete segment's
    * vacuous additions) cost NOTHING in the composed view — without
    * this, every earlier branch pays an anti-join per later segment
    * and an append-only stack grows quadratically
    * (SparseSegmentsSpec's linear-growth test is the regression
    * gate). */
  def emptyLike(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      df.schema)

  /** Segment entries under `root/segs`, ascending by number: (n,
    * dirName, kind) where kind is 'a' (append), 'd' (delete) or '?'
    * (an untagged legacy dir — read in full). On-disk convention:
    * `segs/seg=<n>-<kind>/<table>`; in-flight writes live under
    * `_tmp_…` until [[publishSeg]]'s rename, so a listed segment is
    * always complete. */
  def listSegEntries(s: org.apache.spark.sql.SparkSession,
      root: String): Seq[(Int, String, Char)] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/segs")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("seg=") =>
        val body = n.stripPrefix("seg=")
        val (num, kind) = body.split("-") match {
          case Array(i, k) if k.length == 1 => (i.toInt, k.head)
          case _ => (body.toInt, '?')
        }
        (num, n, kind)
      }
      .sortBy(_._1)
  }

  /** Segment numbers present under `root/segs`, ascending. */
  def listSegs(s: org.apache.spark.sql.SparkSession, root: String)
      : Seq[Int] = listSegEntries(s, root).map(_._1)

  /** Write a segment's tables ATOMICALLY with respect to
    * [[listSegs]]: everything lands under `segs/_tmp_seg=<n>` (a name
    * listSegs never matches) and one directory rename publishes it —
    * a reader that races a nightly write either sees the whole
    * segment or none of it, never a partial bundle. (On an object
    * store without atomic rename the same role falls to a manifest
    * pointer — the compact() doc's trade.) */
  def publishSeg(s: org.apache.spark.sql.SparkSession, root: String,
      n: Int, kind: Char,
      tables: Seq[(String, org.apache.spark.sql.DataFrame)])
      : Unit = {
    val name = s"seg=$n-$kind"
    val tmp = new org.apache.hadoop.fs.Path(s"$root/segs/_tmp_$name")
    val fin = new org.apache.hadoop.fs.Path(s"$root/segs/$name")
    val fs = fin.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(!fs.exists(fin), s"segment $n already published")
    require(listSegEntries(s, root).forall(_._1 != n),
      s"segment number $n already published under another kind")
    if (fs.exists(tmp)) fs.delete(tmp, true) // a dead writer's debris
    graft.sources.Sources.writeOrdered(tables, tmp.toString)
    require(fs.rename(tmp, fin),
      s"failed to publish segment $n (rename $tmp -> $fin)")
  }
}
