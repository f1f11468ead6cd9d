package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star X7): media payloads ride as opaque
  * `binary` columns with typed metadata alongside; decode / feature-extract
  * run as typed `mapPartitions` stages (the Scala analog of `mapInPandas` —
  * batch-shaped, partition-local, no driver involvement).
  *
  * REAL CODECS (since r14): byte-exact BMP/PPM/WAV parsers live in
  * [[ImageCodec]] and the oracle-gated decode pipeline in [[MediaSynth]] —
  * x74/x75/x128/x360/x361 compute over REALLY decoded pixels/samples. The
  * stages below that predate them ([[decodeMeta]], [[sampleFrames]],
  * [[frameFeatures]], [[resizeTo]]) keep their original deterministic-fake
  * transform (metadata from md5 of the payload) because their queries
  * (x70/x71) pin the PLUMBING shape — schema, encoders, partition
  * iteration, 1→N batch shape — which is unchanged by codec choice.
  *
  * Scale: per-row narrow work; heavy decoders want
  * `spark.task.cpus`/partition-size tuning, not a different plan shape.
  */
object Multimodal {

  /** One media-carrying record: payload + mime riding next to the id. */
  final case class MediaDoc(doc_id: Long, content: Array[Byte], mime: String)

  /** Decoded (faked) media metadata. */
  final case class MediaMeta(doc_id: Long, media_len: Int, width: Int, height: Int, n_frames: Int)

  /** Wrap a text corpus as fake media: payload = UTF-8 bytes of `text`. */
  def attachFakeMedia(docs: DataFrame): Dataset[MediaDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("content"),
      lit("image/fake").as("mime")).as[MediaDoc]
  }

  /** Deterministic fake decode: metadata from the payload's md5 hex. This is
    * the stub standing in for a real codec (`???` in spirit); everything
    * around it is production-shaped. */
  private def fakeDecode(m: MediaDoc, md: java.security.MessageDigest): MediaMeta = {
    md.reset()
    val hex = md.digest(m.content).map("%02x".format(_)).mkString
    def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
    MediaMeta(
      doc_id = m.doc_id,
      media_len = m.content.length,
      width = 64 + (nib(0) * 16 + nib(1)) % 448,
      height = 64 + (nib(2) * 16 + nib(3)) % 448,
      n_frames = 1 + nib(0) % 30)
  }

  /** Partition-local decode: one MessageDigest per partition (codecs are
    * exactly the kind of per-batch-expensive resource this shape is for). */
  def decodeMeta(ds: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(m => fakeDecode(m, md))
    }
  }

  /** One sampled frame: payload slice riding with its index. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-frame extracted features (4 fake dims in [0,1]). */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, frame_len: Int,
                                 f0: Double, f1: Double, f2: Double, f3: Double)

  /** Video-style frame sampling: keep every `everyK`-th of the doc's
    * `n_frames` (from the decode metadata), one output row per kept frame —
    * the 1→N explode shape of a real frame sampler, flatMap'd
    * partition-locally. FAKE framing (same stub status as [[fakeDecode]]):
    * frame i is the fixed-stride CHARACTER slice of the payload text
    * (stride = max(1, charLen / n_frames)), re-encoded to bytes — character
    * slicing keeps every frame reproducible by the SQL oracle
    * (`substr(text, i*stride+1, stride)`) even for multi-byte CJK payloads,
    * where byte slicing would split code points. */
  def sampleFrames(ds: Dataset[MediaDoc], everyK: Int): Dataset[MediaFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val nFrames = fakeDecode(m, md).n_frames
        val text = new String(m.content, java.nio.charset.StandardCharsets.UTF_8)
        val stride = math.max(1, text.length / nFrames)
        (0 until nFrames).iterator
          .filter(i => i % everyK == 0 && i * stride < text.length)
          .map { i =>
            val slice = text.substring(i * stride, math.min((i + 1) * stride, text.length))
            MediaFrame(m.doc_id, i, slice.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
      }
    }
  }

  /** Perceptual hash of one media payload (dHash family, 15 bits).
    * Produced since r14 by [[MediaSynth.dhashReal]] — real decode + 4x4
    * nearest-neighbor resize + gradient bits over decoded lumas. */
  final case class MediaHash(doc_id: Long, phash: Int)

  /** Resized media record: payload plus the target geometry it now claims. */
  final case class ResizedMedia(doc_id: Long, content: Array[Byte], mime: String,
                                width: Int, height: Int)

  /** Resize stage: binary-in/binary-out with explicit target geometry —
    * the schema/batch shape of a real image resizer (payload column rides
    * through, metadata updates, per-partition codec init). FAKE transform
    * (stub, like [[fakeDecode]]): output payload is the input truncated to
    * `w*h/64` bytes (a stand-in for "smaller image, content derived from
    * the original") — deterministic, size-monotone with the target area. */
  def resizeTo(ds: Dataset[MediaDoc], w: Int, h: Int): Dataset[ResizedMedia] = {
    require(w > 0 && h > 0, "target geometry must be positive")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.map { m =>
        // long arithmetic: w*h in Int overflows for large geometries and
        // would silently truncate every payload to 1 byte
        val target = math.max(1L, w.toLong * h / 64L)
        val outLen = math.min(m.content.length.toLong, target).toInt
        ResizedMedia(m.doc_id, java.util.Arrays.copyOf(m.content, outLen), m.mime, w, h)
      }
    }
  }

  /** One audio analysis window: overlapping byte-level frame with its
    * per-window signal stats. */
  final case class AudioWindow(doc_id: Long, win_idx: Int, n_samples: Int,
                               energy: Long, peak: Int)

  /** Audio windowing stage (the STFT-frame shape of an audio pipeline):
    * the payload is treated as an unsigned-8-bit sample stream and cut
    * into overlapping windows of `frame` samples every `hop` samples
    * (every start < length emits a window; tails are short). Per window:
    * sample count, total energy (sum of sample values) and peak sample —
    * integer stats, so the SQL rendering (x72) is bit-exact. Real
    * decode/resample swaps in per partition like the other stages; the
    * windowing arithmetic and 1→N batch shape are the real deliverable. */
  def audioWindows(ds: Dataset[MediaDoc], frame: Int, hop: Int): Dataset[AudioWindow] = {
    require(frame > 0 && hop > 0, "frame and hop must be positive")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { m =>
      val b = m.content
      Iterator.range(0, b.length, hop).map { s =>
        val end = math.min(s + frame, b.length)
        var e = 0L; var p = 0; var i = s
        while (i < end) {
          val v = b(i) & 0xff
          e += v; if (v > p) p = v; i += 1
        }
        AudioWindow(m.doc_id, s / hop, end - s, e, p)
      }
    }
  }

  /** Feature extraction over sampled frames (the embed/score stage of a
    * media pipeline): 4 fake dims derived from the frame digest's leading
    * nibbles, scaled to [0,1] — deterministic, oracle-reproducible; a real
    * model swaps in behind the same partition-local-resource shape. */
  def frameFeatures(frames: Dataset[MediaFrame]): Dataset[FrameFeatures] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { fr =>
        md.reset()
        val d = md.digest(fr.frame)
        def nib(i: Int): Int = (d(i / 2) >> (4 * (1 - i % 2))) & 0xf
        FrameFeatures(fr.doc_id, fr.frame_idx, fr.frame.length,
          nib(0) / 15.0, nib(1) / 15.0, nib(2) / 15.0, nib(3) / 15.0)
      }
    }
  }
}
