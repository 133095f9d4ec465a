package graft.streaming

import graft.etl.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming CDC ingestion into an SCD2 dimension: each micro-batch of
  * snapshot updates folds into persistent type-2 state via
  * `foreachBatch` + [[graft.etl.Scd2.merge]] — the continuous twin of
  * the batch j04 merge, and the pattern a warehouse uses to keep
  * dimensions current without rebuild (reference rebuilds per run,
  * main_etl_pipeline.py:714-760).
  *
  * State is a DOUBLE-BUFFERED parquet directory: each batch writes
  * `state_v<N+1>` and then atomically repoints a version file (tmp +
  * ATOMIC_MOVE), so a crash mid-batch leaves the previous state intact
  * and readable. The version file also records the last applied batch
  * id — `foreachBatch` re-delivers a batch after restart, and the
  * guard makes re-application a no-op (effectively-once state
  * updates).
  *
  * Within a batch, the latest row per key wins (`row_number` by the
  * as-of column descending); the batch's max as-of date stamps the
  * merge, matching "each micro-batch is a snapshot at a point".
  */
object CdcMerge {

  /** `trigger` defaults to the continuous processing-time trigger; pass
    * `Trigger.AvailableNow()` for drain-and-stop runs (nightly catch-up
    * — and the deterministic mode the spec uses: a continuously-polling
    * file source can list a multi-file input write MID-COMMIT and split
    * its rows across micro-batches, which is correct but
    * non-deterministic). */
  def run(updates: DataFrame, stateDir: String, key: Seq[String],
      attrs: Seq[String], asOfCol: String, checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, stateDir, key, attrs, asOfCol)
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** The current SCD2 state (empty None before the first batch). */
  def current(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readVersion(stateDir).map { case (v, _) =>
      spark.read.parquet(s"$stateDir/state_v$v")
    }

  /** One micro-batch: dedup to latest-per-key, merge into the current
    * state, publish the next version. Visible for direct testing. */
  def applyBatch(batch: DataFrame, batchId: Long, stateDir: String,
      key: Seq[String], attrs: Seq[String], asOfCol: String): Unit = {
    val prev = readVersion(stateDir)
    if (prev.exists(_._2 >= batchId)) return // crash-replay: already applied
    if (batch.isEmpty) { writeVersion(stateDir, prev.map(_._1).getOrElse(0), batchId); return }

    val spark = batch.sparkSession
    val latest = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(key.map(col): _*)
          .orderBy(col(asOfCol).desc)))
      .filter(col("__rn") === 1)
      .select((key ++ attrs).map(col): _*)
    val asOf = batch.agg(max(col(asOfCol))).head().get(0)

    val current = prev match {
      case Some((v, _)) => spark.read.parquet(s"$stateDir/state_v$v")
      case None => Scd2.seed(
        batch.select((key ++ attrs).map(col): _*).limit(0), lit(null))
    }
    val next = prev.map(_._1).getOrElse(0) + 1
    Scd2.merge(current, latest, key, attrs, lit(asOf))
      .write.mode("overwrite").parquet(s"$stateDir/state_v$next")
    writeVersion(stateDir, next, batchId)
  }

  private def readVersion(stateDir: String): Option[(Int, Long)] = {
    val p = Paths.get(stateDir, "_VERSION")
    if (!Files.exists(p)) None
    else {
      val Array(v, b) = Files.readString(p).trim.split(",")
      Some((v.toInt, b.toLong))
    }
  }

  private def writeVersion(stateDir: String, ver: Int,
      batchId: Long): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    val tmp = Paths.get(stateDir, "_VERSION.tmp")
    Files.write(tmp, s"$ver,$batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(stateDir, "_VERSION"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
