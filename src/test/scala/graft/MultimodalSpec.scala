package graft

import graft.multimodal.Multimodal

/** X7: binary media column + typed partition-local decode plumbing. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("attach + decode: deterministic metadata, sane ranges, byte-accurate length") {
    val docs = Seq((1L, "hello world"), (2L, "another doc"), (3L, "hello world"))
      .toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.attachFakeMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(meta.map(_.media_len).toSeq == Seq(11, 11, 11))
    assert(meta.forall(m => m.width >= 64 && m.width < 512))
    assert(meta.forall(m => m.height >= 64 && m.height < 512))
    assert(meta.forall(m => m.n_frames >= 1 && m.n_frames <= 30))
    // same payload -> same fake decode (determinism)
    assert(meta(0).width == meta(2).width && meta(0).height == meta(2).height)
    // different payload -> (virtually certainly) different metadata hash source
    assert(meta(0).width != meta(1).width || meta(0).height != meta(1).height
      || meta(0).n_frames != meta(1).n_frames)
  }

  test("sampleFrames: every k-th frame, contiguous char slices, CJK-safe") {
    val docs = Seq((1L, "abcdefghij" * 10), (2L, "世界" * 20)).toDF("doc_id", "text")
    val media = Multimodal.attachFakeMedia(docs)
    val all = Multimodal.sampleFrames(media, everyK = 1).collect()
    val sampled = Multimodal.sampleFrames(media, everyK = 3).collect()
    // sampling keeps exactly the frame_idx % 3 == 0 subset
    assert(sampled.map(f => (f.doc_id, f.frame_idx)).toSet ==
      all.filter(_.frame_idx % 3 == 0).map(f => (f.doc_id, f.frame_idx)).toSet)
    assert(all.forall(_.frame_idx >= 0) && all.nonEmpty)
    // frames re-assemble into a prefix of the original text (char slicing
    // never splits a multi-byte char)
    for (id <- Seq(1L, 2L)) {
      val text = if (id == 1L) "abcdefghij" * 10 else "世界" * 20
      val joined = all.filter(_.doc_id == id).sortBy(_.frame_idx)
        .map(f => new String(f.frame, java.nio.charset.StandardCharsets.UTF_8)).mkString
      assert(text.startsWith(joined) && joined.nonEmpty)
    }
  }

  test("resizeTo: geometry attached, payload bounded by target area, schema preserved") {
    val docs = Seq((1L, "x" * 2000), (2L, "y")).toDF("doc_id", "text")
    val resized = Multimodal.resizeTo(Multimodal.attachFakeMedia(docs), 64, 64)
      .collect().sortBy(_.doc_id)
    assert(resized.map(r => (r.width, r.height)).toSeq == Seq((64, 64), (64, 64)))
    assert(resized(0).content.length == 64 * 64 / 64)  // truncated to target area
    assert(resized(1).content.length == 1)             // never grows past the input
    assert(resized.forall(_.mime == "image/fake"))
  }

  test("frameFeatures: deterministic [0,1] features, byte-accurate frame_len") {
    val docs = Seq((1L, "hello world, a modest payload")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.attachFakeMedia(docs), everyK = 1)
    val feats = Multimodal.frameFeatures(frames).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => Seq(f.f0, f.f1, f.f2, f.f3).forall(x => x >= 0.0 && x <= 1.0)))
    assert(feats.forall(_.frame_len > 0))
    // determinism: re-running yields identical rows
    val again = Multimodal.frameFeatures(frames).collect()
    assert(feats.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}
