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
}
