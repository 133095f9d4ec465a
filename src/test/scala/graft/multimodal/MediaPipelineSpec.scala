package graft.multimodal

import graft.{SparkSpec, Tables}

class MediaPipelineSpec extends SparkSpec {

  test("binary payload plumbing: metadata extraction is deterministic") {
    val media = MediaPipeline.fromText(
      Tables.documents(spark, sf).limit(20), "doc_id", "text")
    val meta = MediaPipeline.extractMeta(media).collect()
    assert(meta.length == 20)
    assert(meta.forall(m => m.width >= 320 && m.width < 1600))
    assert(meta.forall(m => Set("h264", "vp9", "av1").contains(m.codec)))
    // deterministic: second run identical
    val again = MediaPipeline.extractMeta(media).collect()
    assert(meta.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("png write/parse round trip: real header bytes, exact dims") {
    import MediaPipeline._
    val p = pngBytes(1234, 987)
    assert(p.length == SyntheticPngLen)
    // spec-valid prefix: signature + IHDR length/type
    assert((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G')
    val meta = decodePng(MediaRow(7L, p))
    assert(meta.contains(
      MediaMeta(7L, SyntheticPngLen, 1234, 987, 1, "png")))
    // a parse-level reader (ImageIO would reject the fake IDAT, but
    // header fields must agree with a big-endian manual read)
    val bb = java.nio.ByteBuffer.wrap(p, 16, 8)
    assert(bb.getInt == 1234 && bb.getInt == 987)
  }

  test("png decode rejects corrupt payloads and dispatch falls back") {
    import MediaPipeline._
    val good = pngBytes(64, 32)
    val badCrc = good.clone(); badCrc(30) = (badCrc(30) ^ 0x01).toByte
    assert(decodePng(MediaRow(1L, badCrc)).isEmpty)
    val truncated = good.take(20)
    assert(decodePng(MediaRow(2L, truncated)).isEmpty)
    val notPng = "hello world, definitely text".getBytes
    assert(decodePng(MediaRow(3L, notPng)).isEmpty)
    // dispatch: png → real parse; non-png → stub
    assert(decode(MediaRow(1L, good)).codec == "png")
    assert(Set("h264", "vp9", "av1").contains(
      decode(MediaRow(3L, notPng)).codec))
  }

  test("wav write/parse round trip: real RIFF header fields") {
    import MediaPipeline._
    val p = wavBytes(44100, 2, 441000L)
    assert(p.length == 44)
    assert(new String(p, 0, 4) == "RIFF" && new String(p, 8, 4) == "WAVE")
    val meta = decodeWav(MediaRow(9L, p))
    assert(meta.contains(AudioMeta(9L, 44100, 2, 16, 441000L)))
  }

  test("wav decode rejects non-wav and non-pcm payloads") {
    import MediaPipeline._
    assert(decodeWav(MediaRow(1L, "not audio at all".getBytes)).isEmpty)
    assert(decodeWav(MediaRow(2L, pngBytes(10, 10))).isEmpty)
    val bad = wavBytes(16000, 1, 1000L)
    bad(20) = 3 // audioFormat != PCM
    assert(decodeWav(MediaRow(3L, bad)).isEmpty)
    val truncated = wavBytes(16000, 1, 1000L).take(30)
    assert(decodeWav(MediaRow(4L, truncated)).isEmpty)
  }

  test("mp4 write/parse round trip: real box walk, 16.16 dims") {
    import MediaPipeline._
    val p = mp4Bytes(1920, 1080, 600, 7200)
    assert(p.length == 232)
    assert(new String(p, 4, 4) == "ftyp")
    val meta = decodeMp4(MediaRow(5L, p))
    assert(meta.contains(VideoMeta(5L, 600, 7200L, 1920, 1080)))
  }

  test("mp4 decode rejects malformed box structures") {
    import MediaPipeline._
    assert(decodeMp4(MediaRow(1L, "RIFFnot an mp4 file at all".getBytes))
      .isEmpty)
    assert(decodeMp4(MediaRow(2L, pngBytes(8, 8))).isEmpty)
    val good = mp4Bytes(640, 480, 600, 600)
    val noMoov = good.clone(); noMoov(16 + 5) = 'x'.toByte // moov→mxov
    assert(decodeMp4(MediaRow(3L, noMoov)).isEmpty)
    val badLen = good.clone()
    // corrupt mvhd's size so the child walk runs off the moov end
    java.nio.ByteBuffer.wrap(badLen, 24, 4).putInt(5000)
    assert(decodeMp4(MediaRow(4L, badLen)).isEmpty)
  }

  test("avi write→walk round trip recovers every frame exactly") {
    import MediaPipeline._
    val bytes = aviBytes(5, i => 10 + i, i => 100 + i)
    val frames = walkAviFrames(MediaRow(7L, bytes)).get
    assert(frames.map(_.frame_idx) == Seq(0, 1, 2, 3, 4))
    assert(frames.map(_.len) == Seq(10, 11, 12, 13, 14))
    // offsets: movi data + cumulative (8 + len + pad), payload-start
    var off = AviMoviStart + 8L
    frames.foreach { f =>
      assert(f.offset == off, s"frame ${f.frame_idx}")
      assert((bytes(f.offset.toInt) & 0xff) == 100 + f.frame_idx,
        "first data byte must sit exactly at the walked offset")
      off += 8 + f.len + f.len % 2
    }
  }

  test("avi walk rejects malformed containers") {
    import MediaPipeline._
    assert(walkAviFrames(MediaRow(1L, "RIFFjunk".getBytes)).isEmpty)
    assert(walkAviFrames(MediaRow(2L, pngBytes(8, 8))).isEmpty)
    val good = aviBytes(3, _ => 10, _ => 1)
    val liar = good.clone() // avih declares 4 frames, movi holds 3
    java.nio.ByteBuffer.wrap(liar, 48, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4)
    assert(walkAviFrames(MediaRow(3L, liar)).isEmpty)
    val trunc = good.clone() // frame 1's size runs past movi's end
    java.nio.ByteBuffer.wrap(trunc, AviMoviStart + 8 + 10 + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(5000)
    assert(walkAviFrames(MediaRow(4L, trunc)).isEmpty)
    // adversarial sizes must REJECT, not throw (r6 review findings):
    val negHdrl = good.clone() // negative hdrl LIST size
    java.nio.ByteBuffer.wrap(negHdrl, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-100)
    assert(walkAviFrames(MediaRow(5L, negHdrl)).isEmpty)
    val wrapLen = good.clone() // chunk len near Int.MaxValue wraps end
    java.nio.ByteBuffer.wrap(wrapLen, AviMoviStart + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(2147483600)
    assert(walkAviFrames(MediaRow(6L, wrapLen)).isEmpty)
    val negMovi = good.clone() // negative movi LIST size
    val hdrlEnd = 20 + java.nio.ByteBuffer.wrap(good, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
    java.nio.ByteBuffer.wrap(negMovi, hdrlEnd + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-8)
    assert(walkAviFrames(MediaRow(7L, negMovi)).isEmpty)
  }

  test("zero-length (dropped) frames round-trip without payload reads") {
    import MediaPipeline._
    import spark.implicits._
    // frame 1 is a dropped frame (len 0); trailing frame also len 0
    val bytes = aviBytes(3, i => if (i == 0) 6 else 0, i => 40 + i)
    val walked = walkAviFrames(MediaRow(8L, bytes)).get
    assert(walked.map(_.len) == Seq(6, 0, 0))
    val samples = sampleFrames(
      spark.createDataset(Seq(MediaRow(8L, bytes))), 1).collect()
      .sortBy(_.frame_idx)
    assert(samples.map(_.byte_len).toSeq == Seq(6, 0, 0))
    assert(samples(0).feature == 40 / 255.0)
    // dropped frames carry feature 0.0, never the next chunk's header
    assert(samples(1).feature == 0.0 && samples(2).feature == 0.0)
  }

  test("frame sampler emits every-kth REAL frame per media row") {
    import MediaPipeline._
    import spark.implicits._
    val media = spark.createDataset((1L to 5L).map(id =>
      MediaRow(id, aviBytes((1 + id % 4).toInt,
        i => 10 + i, i => (id + i).toInt))))
    val frames = sampleFrames(media, 2).collect()
    val expected = (1L to 5L).map(id => ((1 + id % 4) + 1) / 2).sum
    assert(frames.length == expected.toInt)
    assert(frames.forall(f => f.frame_idx % 2 == 0))
    assert(frames.forall(f =>
      f.feature == ((f.media_id + f.frame_idx) % 256) / 255.0))
    // a non-AVI payload contributes zero frames, not garbage
    val mixed = media.union(spark.createDataset(Seq(
      MediaRow(99L, "not a container".getBytes))))
    assert(sampleFrames(mixed, 2).collect().length == expected.toInt)
  }
}
