package graft.etl

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative and multi-consumer plans.
  *
  * Every iterative operator in the engine (connected components,
  * SemDeDup's shared corpus, the overlap matrices) must cut lineage —
  * without it, round N's plan nests round N-1's and Catalyst analysis
  * blows up at real iteration counts. HOW to cut is a deployment
  * decision, not an operator decision:
  *
  *  - `localCheckpoint` (the default) keeps blocks on executors —
  *    fastest, but a lost executor loses the blocks AND the lineage
  *    to recompute them. Fine on local[*] and for short-lived plans.
  *  - reliable `checkpoint()` writes to a fault-tolerant directory
  *    (HDFS/object store on a cluster) — the right mode for long
  *    iterative jobs on preemptible executors, exactly as the
  *    `localCheckpoint` scaladoc itself recommends.
  *
  * Setting the session conf `graft.checkpoint.dir` to a directory
  * switches EVERY cut() in the engine to reliable checkpoints rooted
  * there; unset (the default) keeps localCheckpoint. The same
  * operator code runs in both modes — see CheckpointsSpec.
  */
object Checkpoints {
  /** Session conf key: when set (non-empty), cut() uses reliable
    * `checkpoint()` rooted at this directory instead of
    * `localCheckpoint()`. */
  val DirConf = "graft.checkpoint.dir"

  /** True when the session is in reliable-checkpoint mode. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(DirConf).exists(_.nonEmpty)

  /** Truncate `df`'s lineage per the session's checkpoint policy.
    * `eager` as in Dataset.checkpoint/localCheckpoint. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        // setCheckpointDir creates a unique subdir per call — only
        // (re)point it when the configured root actually changed.
        // Compare PATH components: the stored dir comes back
        // fs-qualified ("file:/ckpt/<uuid>"), so a raw startsWith
        // against an unqualified conf value would never match and
        // every cut() would mint a fresh UUID directory.
        val rootPath = new org.apache.hadoop.fs.Path(dir).toUri.getPath
        val pointed = sc.getCheckpointDir.exists(cur =>
          new org.apache.hadoop.fs.Path(cur).toUri.getPath
            .startsWith(rootPath + "/"))
        if (!pointed) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Release the storage behind a Dataset previously returned by
    * [[cut]], once NOTHING will read it again (e.g. the previous
    * round of an iterative loop after the next round materialized).
    * Reliable mode: deletes the checkpoint files — without this a
    * converged CC run leaves ~rounds+1 directories under the
    * configured root forever. Local mode: unpersists the cached
    * blocks backing the localCheckpoint. No-op for non-cut inputs.
    * (Alternative for GC-driven cleanup: start the context with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; release
    * is deterministic and needs no context conf.) */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.backingRdd(df).foreach { r =>
      r.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      r.unpersist(blocking = false)
    }

  /** Chainable form: `df.cut(false)` ≡ `Checkpoints.cut(df, false)` —
    * drop-in replacement for `.localCheckpoint(...)` call sites. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(eager: Boolean = true): DataFrame = Checkpoints.cut(df, eager)
  }
}
