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

  test("frame sampler emits every-kth frame per media row") {
    val media = MediaPipeline.fromText(
      Tables.documents(spark, sf).limit(5), "doc_id", "text")
    val frames = MediaPipeline.sampleFrames(media, 2).collect()
    val metas = MediaPipeline.extractMeta(media).collect()
    val expected = metas.map(m => (m.frames + 1) / 2).sum
    assert(frames.length == expected)
    assert(frames.forall(f => f.frame_idx % 2 == 0))
  }
}
