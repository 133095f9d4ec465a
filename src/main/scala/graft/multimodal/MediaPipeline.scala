package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decoded partition-parallel.
  *
  * The decode itself is a STUB — this container ships no image/audio
  * codecs — but it is a *deterministic* stub (arithmetic on the payload
  * bytes), so the surrounding Spark plumbing (schema, encoders,
  * mapPartitions batching, partition sizing) is fully real and testable.
  * Swapping `decodeStub` for a JNI/javacv call changes nothing upstream.
  *
  * Scale notes: decode runs inside `mapPartitions` so per-partition
  * setup (codec init, model load) amortizes across rows; payloads stay
  * off the driver; partition size is governed by
  * `spark.sql.files.maxPartitionBytes` on the parquet scan.
  */
object MediaPipeline {

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, byte_len: Int, width: Int,
      height: Int, frames: Int, codec: String)
  final case class FrameSample(media_id: Long, frame_idx: Int,
      feature: Double)

  /** STUB decode: stands in for an image/audio header parse. Derives
    * metadata deterministically from the byte length so tests and the
    * m01 oracle query agree. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    MediaMeta(r.media_id, n, 320 + n % 1280, 240 + (n * 7) % 720,
      1 + n % 30, (n % 3) match {
        case 0 => "h264"; case 1 => "vp9"; case _ => "av1"
      })
  }

  /** Binary payloads → typed metadata, partition-parallel. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (codec handles, buffers) would live here
      it.map(decodeStub)
    }
  }

  /** STUB frame sampler: every k-th "frame" emits a fake feature —
    * demonstrates the 1→N generator shape of video frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val meta = decodeStub(r)
      (0 until meta.frames by everyK).map { f =>
        FrameSample(r.media_id, f,
          (r.payload.headOption.getOrElse(0: Byte).toInt + f) / 255.0)
      }
    }
  }

  /** Lift a (id, string) DataFrame into the media contract — used by
    * tests and the m01 query path over documents.text payloads. */
  def fromText(df: DataFrame, idCol: String, textCol: String)
      : Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }
}
