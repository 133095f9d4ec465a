package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decoded partition-parallel.
  *
  * All four container paths are real: PNG payloads are parsed from
  * their actual bytes (signature + IHDR chunk, CRC-verified), WAV
  * payloads from their RIFF/fmt/data header fields, MP4 metadata
  * from a genuine ISO-BMFF box walk, and video FRAMES from an
  * MJPEG-in-AVI RIFF chunk walk ([[walkAviFrames]]) — all pure JVM,
  * no codec dependency — with [[pngBytes]]/[[wavBytes]]/[[mp4Bytes]]/
  * [[aviBytes]] writing spec-valid files so every write→parse round
  * trip is oracle-checkable end to end (m01/m03/m04/m06/m02). Only
  * codec-level pixel/sample decode is out of scope (this container
  * ships no codecs); `decodeStub` remains solely as the
  * unknown-container fallback of [[decode]].
  *
  * Scale notes: decode runs inside `mapPartitions` so per-partition
  * setup (codec handles, buffers) amortizes across rows; payloads stay
  * off the driver; partition size is governed by
  * `spark.sql.files.maxPartitionBytes` on the parquet scan.
  */
object MediaPipeline {

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, byte_len: Int, width: Int,
      height: Int, frames: Int, codec: String)
  final case class FrameSample(media_id: Long, frame_idx: Int,
      offset: Long, byte_len: Int, feature: Double)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a,
    0x0a).map(_.toByte)

  /** Byte length of every [[pngBytes]] output: 8 signature + 25 IHDR
    * + 22 IDAT (10 payload bytes) + 12 IEND. The m01 oracle pins this
    * constant, so a writer change that shifts it fails the gate. */
  val SyntheticPngLen: Int = 8 + 25 + 22 + 12

  /** Minimal spec-valid PNG: signature, IHDR (real CRC32), one fixed
    * IDAT, IEND. The header parse path treats it exactly like a real
    * file — only the pixel data is fake. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(SyntheticPngLen)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val crc = new java.util.zip.CRC32()
      val t = tpe.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      out.put(t).put(data).putInt(crc.getValue.toInt)
    }
    out.put(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/none/none
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", Array.fill(10)(0.toByte))
    chunk("IEND", Array.empty)
    out.array()
  }

  /** Real PNG header parse: verifies the 8-byte signature and the
    * IHDR chunk layout + CRC, returns its width/height. None for
    * anything that isn't a well-formed PNG prefix. */
  def decodePng(r: MediaRow): Option[MediaMeta] = {
    val p = r.payload
    if (p.length < 33 || !p.view.take(8).sameElements(PngSig)) None
    else {
      val bb = java.nio.ByteBuffer.wrap(p, 8, 25)
      val len = bb.getInt
      val tpe = new Array[Byte](4); bb.get(tpe)
      if (len != 13 || new String(tpe, "US-ASCII") != "IHDR") None
      else {
        val width = bb.getInt
        val height = bb.getInt
        val crc = new java.util.zip.CRC32()
        crc.update(p, 12, 4 + 13)
        val stored = java.nio.ByteBuffer.wrap(p, 8 + 4 + 4 + 13, 4).getInt
        if (crc.getValue.toInt != stored) None
        else Some(MediaMeta(r.media_id, p.length, width, height, 1, "png"))
      }
    }
  }

  final case class AudioMeta(media_id: Long, sample_rate: Int,
      channels: Int, bits: Int, n_samples: Long)

  /** Minimal spec-valid PCM WAV header (44 bytes, little-endian):
    * RIFF size, WAVE, fmt chunk (PCM, 16-bit), and a data chunk whose
    * SIZE field declares `nSamples` — the body itself is omitted,
    * which is exactly the header-probe case (ffprobe on a range
    * request / object-store prefix read): real audio metadata comes
    * from the header fields, never from scanning the PCM body. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Long)
      : Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = (nSamples * blockAlign).toInt
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Real RIFF/WAVE header parse: verifies the RIFF/WAVE/fmt/data
    * chunk layout and PCM format, returns rate/channels/bits and the
    * sample count from the declared data-chunk size. None for
    * anything that isn't a well-formed PCM WAV prefix. */
  def decodeWav(r: MediaRow): Option[AudioMeta] = {
    val p = r.payload
    def tag(off: Int, s: String): Boolean =
      new String(p, off, 4, "US-ASCII") == s
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE") ||
        !tag(12, "fmt ") || !tag(36, "data")) None
    else {
      val bb = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val fmtLen = bb.getInt(16)
      val audioFormat = bb.getShort(20)
      if (fmtLen != 16 || audioFormat != 1) None
      else {
        val channels = bb.getShort(22).toInt
        val sampleRate = bb.getInt(24)
        val blockAlign = bb.getShort(32).toInt
        val bits = bb.getShort(34).toInt
        val dataLen = bb.getInt(40).toLong
        // blockAlign <= 0 must be rejected explicitly: bits=0 gives
        // blockAlign==channels*bits/8==0, which would pass the shape
        // check and divide by zero below.
        if (channels <= 0 || blockAlign <= 0 ||
            blockAlign != channels * bits / 8) None
        else Some(AudioMeta(r.media_id, sampleRate, channels, bits,
          dataLen / blockAlign))
      }
    }
  }

  /** Audio payloads → typed metadata, partition-parallel (the WAV
    * twin of [[extractMeta]]). */
  def extractAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeWav))
  }

  final case class VideoMeta(media_id: Long, timescale: Int,
      duration_units: Long, width: Int, height: Int)

  /** Minimal spec-valid ISO-BMFF (MP4) prefix: `ftyp` + `moov`
    * containing a version-0 `mvhd` (timescale, duration) and one
    * `trak`/`tkhd` (16.16 fixed-point width/height). 232 bytes, no
    * media data — the same header-probe stance as [[wavBytes]]: real
    * video metadata lives in moov, which players/probers read without
    * touching mdat. */
  def mp4Bytes(width: Int, height: Int, timescale: Int,
      durationUnits: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(232) // big-endian by default
    def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    // ftyp
    bb.putInt(16); tag("ftyp"); tag("isom"); bb.putInt(0x200)
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92))
    bb.putInt(216); tag("moov")
    bb.putInt(108); tag("mvhd")
    bb.putInt(0)                  // version/flags
    bb.putInt(0).putInt(0)        // ctime/mtime
    bb.putInt(timescale).putInt(durationUnits)
    bb.putInt(0x00010000)         // rate 1.0
    bb.putShort(0x0100.toShort)   // volume 1.0
    bb.put(new Array[Byte](10))   // reserved
    bb.put(new Array[Byte](36))   // matrix (zeros fine for a probe)
    bb.put(new Array[Byte](24))   // predefined
    bb.putInt(2)                  // next track id
    bb.putInt(100); tag("trak")
    bb.putInt(92); tag("tkhd")
    bb.putInt(0)                  // version/flags
    bb.putInt(0).putInt(0)        // ctime/mtime
    bb.putInt(1)                  // track id
    bb.putInt(0)                  // reserved
    bb.putInt(durationUnits)
    bb.put(new Array[Byte](8))    // reserved
    bb.putShort(0).putShort(0)    // layer / alt group
    bb.putShort(0).putShort(0)    // volume / reserved
    bb.put(new Array[Byte](36))   // matrix
    bb.putInt(width << 16)        // 16.16 fixed
    bb.putInt(height << 16)
    bb.array()
  }

  /** Real ISO-BMFF header parse: walks top-level boxes to `moov`,
    * then its children for `mvhd` (timescale/duration) and the first
    * `trak`'s `tkhd` (width/height). None unless all three boxes are
    * present and well-formed. */
  def decodeMp4(r: MediaRow): Option[VideoMeta] = {
    val p = r.payload
    def typ(off: Int) =
      if (off + 8 <= p.length) new String(p, off + 4, 4, "US-ASCII")
      else ""
    def len(off: Int) = java.nio.ByteBuffer.wrap(p, off, 4).getInt
    def findBox(from: Int, end: Int, name: String): Option[Int] = {
      var off = from
      while (off + 8 <= end) {
        val l = len(off)
        if (l < 8 || off + l > end) return None
        if (typ(off) == name) return Some(off)
        off += l
      }
      None
    }
    if (p.length < 16 || typ(0) != "ftyp") None
    else for {
      moov <- findBox(0, p.length, "moov")
      mvhd <- findBox(moov + 8, moov + len(moov), "mvhd")
      if len(mvhd) >= 32 && p(mvhd + 8) == 0 // version 0
      trak <- findBox(moov + 8, moov + len(moov), "trak")
      tkhd <- findBox(trak + 8, trak + len(trak), "tkhd")
      if len(tkhd) >= 92 && p(tkhd + 8) == 0
    } yield {
      val bb = java.nio.ByteBuffer.wrap(p)
      VideoMeta(r.media_id,
        bb.getInt(mvhd + 20),
        bb.getInt(mvhd + 24).toLong & 0xffffffffL,
        bb.getInt(tkhd + 84) >>> 16,
        bb.getInt(tkhd + 88) >>> 16)
    }
  }

  /** Video payloads → typed metadata, partition-parallel (the MP4
    * member of the extract family). */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeMp4))
  }

  /** STUB decode: stands in for a generic unknown-container parse.
    * Derives metadata deterministically from the byte length so tests
    * and the oracle queries agree. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    MediaMeta(r.media_id, n, 320 + n % 1280, 240 + (n * 7) % 720,
      1 + n % 30, (n % 3) match {
        case 0 => "h264"; case 1 => "vp9"; case _ => "av1"
      })
  }

  /** Format dispatch: real parse for PNG payloads, stub otherwise. */
  def decode(r: MediaRow): MediaMeta = decodePng(r).getOrElse(decodeStub(r))

  /** Binary payloads → typed metadata, partition-parallel. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (codec handles, buffers) would live here
      it.map(decode)
    }
  }

  // -------------------------------------------------------------------
  // MJPEG-in-AVI frame walk (the video twin of the WAV RIFF walker):
  // a real RIFF container whose `movi` list holds one `00dc` chunk per
  // frame. The walk parses the ACTUAL chunk structure — ids, sizes,
  // word alignment — and cross-checks the frame count declared in the
  // `avih` main header against the chunks actually found, exactly how
  // an indexer seeks frames in an MJPEG AVI. Only the codec-level
  // pixel decode of each frame payload stays out of scope (no codecs
  // in this container) — same stance as the PNG/WAV/MP4 paths.
  // -------------------------------------------------------------------

  /** One frame located inside an AVI payload: byte offset OF THE
    * FRAME DATA (past its `00dc` header) and its length. */
  final case class FrameRef(frame_idx: Int, offset: Long, len: Int)

  /** Fixed prefix of every [[aviBytes]] output: 12-byte RIFF header +
    * 76-byte `hdrl` list (one 56-byte `avih`) + 12-byte `movi` list
    * header. Frame 0's chunk starts here. */
  val AviMoviStart: Int = 12 + 76 + 12

  /** Minimal spec-valid AVI: RIFF(`AVI `) → LIST(`hdrl`)(avih) →
    * LIST(`movi`) with `nFrames` `00dc` video chunks. Frame i's
    * payload is `frameLen(i)` bytes, word-aligned per RIFF, first
    * byte `firstByte(i)` — deterministic so the write→walk round
    * trip is oracle-checkable from the id alone (m02). */
  def aviBytes(nFrames: Int, frameLen: Int => Int,
      firstByte: Int => Int): Array[Byte] = {
    val lens = (0 until nFrames).map(frameLen)
    require(lens.forall(_ >= 0), s"negative frame length in $lens")
    val moviData = lens.map(l => 8 + l + (l % 2)).sum
    val total = AviMoviStart + moviData
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); out.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); out.putInt(4 + 8 + 56); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(33333)      // dwMicroSecPerFrame (~30 fps)
      .putInt(0).putInt(0) // dwMaxBytesPerSec, dwPaddingGranularity
      .putInt(0)           // dwFlags
      .putInt(nFrames)     // dwTotalFrames — cross-checked by the walk
      .putInt(0).putInt(1) // dwInitialFrames, dwStreams
      .putInt(0)           // dwSuggestedBufferSize
      .putInt(0).putInt(0) // dwWidth, dwHeight (codec-level, unused)
    (0 until 4).foreach(_ => out.putInt(0)) // dwReserved
    fourcc("LIST"); out.putInt(4 + moviData); fourcc("movi")
    lens.zipWithIndex.foreach { case (l, i) =>
      fourcc("00dc"); out.putInt(l)
      // l == 0 is a legal dropped frame: header only, no data byte
      var j = 0
      while (j < l) { out.put(((firstByte(i) + j) % 256).toByte); j += 1 }
      if (l % 2 == 1) out.put(0.toByte) // RIFF word alignment
    }
    out.array()
  }

  /** Real AVI frame walk: verifies RIFF/`AVI ` + `hdrl`/`avih`, then
    * walks the `movi` list chunk by chunk (honoring each declared
    * size + word alignment) collecting every `00dc` frame's offset
    * and length. None for malformed structure, truncated chunks, or a
    * frame count that contradicts the `avih` header — the same
    * reject-don't-throw stance as the PNG/WAV/MP4 parsers. */
  def walkAviFrames(r: MediaRow): Option[Seq[FrameRef]] = {
    val p = r.payload
    def tag(off: Int, s: String): Boolean =
      off + 4 <= p.length &&
        new String(p, off, 4, "US-ASCII") == s
    if (p.length < AviMoviStart || !tag(0, "RIFF") || !tag(8, "AVI ") ||
        !tag(12, "LIST") || !tag(20, "hdrl") || !tag(24, "avih")) None
    else {
      val bb = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val declared = bb.getInt(48) // avih dwTotalFrames
      // adversarial sizes must REJECT, not throw: a negative hdrl
      // size would send hdrlEnd below 0 (tag() would then index with
      // a negative offset), and chunk lengths near Int.MaxValue would
      // wrap the end-of-chunk arithmetic — do both bounds checks on
      // non-wrapping values
      val hdrlSize = bb.getInt(16)
      val hdrlEnd = 20 + hdrlSize
      if (hdrlSize < 0 || hdrlEnd < 0 || hdrlEnd + 12 > p.length ||
          !tag(hdrlEnd, "LIST") || !tag(hdrlEnd + 8, "movi")) None
      else {
        val moviSize = bb.getInt(hdrlEnd + 4)
        val moviEnd = hdrlEnd + 8 + moviSize
        if (moviSize < 0 || moviEnd > p.length) None
        else {
          val frames = Seq.newBuilder[FrameRef]
          var pos = hdrlEnd + 12
          var idx = 0
          var ok = true
          while (ok && pos + 8 <= moviEnd) {
            val len = bb.getInt(pos + 4)
            val end = pos.toLong + 8L + len + (len % 2)
            if (len < 0 || end > moviEnd) ok = false
            else {
              if (tag(pos, "00dc")) {
                frames += FrameRef(idx, pos + 8L, len)
                idx += 1
              }
              pos = end.toInt // end <= moviEnd <= p.length here
            }
          }
          val out = frames.result()
          if (ok && pos == moviEnd && out.size == declared) Some(out)
          else None
        }
      }
    }
  }

  /** Frame sampler over REAL container bytes: walks each AVI
    * payload's `movi` chunk index and emits every k-th frame with its
    * actual in-file offset, length, and a feature from the frame's
    * first data byte (where the pixel decode would run). Non-AVI
    * payloads yield no frames. 1→N generator, partition-parallel. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      walkAviFrames(r).getOrElse(Seq.empty)
        .filter(_.frame_idx % everyK == 0)
        // a zero-length (dropped) frame has no data byte — its offset
        // points at the NEXT chunk's header, which must not leak into
        // the feature
        .map(f => FrameSample(r.media_id, f.frame_idx, f.offset, f.len,
          if (f.len == 0) 0.0
          else (r.payload(f.offset.toInt) & 0xff) / 255.0))
    })
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
