package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Deterministic media synthesis + REAL-decode feature extraction (r13
  * verdict "Next round #1").
  *
  * The pixel CONTENT of every synthetic frame is a pure function of the
  * `documents` row (md5 over character cells of `text` — the same CJK-safe
  * framing the earlier stub used), so a DuckDB oracle re-derives the exact
  * pixels in SQL. The Spark path, however, goes through REAL bytes:
  * pixels → [[ImageCodec.encodeBmp]]/[[ImageCodec.encodePpm]] → a
  * concatenated-frame video container → [[ImageCodec.decodeFrames]] →
  * features. Any decoder defect — BGR vs RGB order, bottom-up row flip,
  * 4-byte row padding, PPM comment/whitespace grammar, container length
  * arithmetic — lands in the features and fails the oracle hash, so the
  * byte-exact parse itself is oracle-gated (not just the plumbing).
  *
  * Per-doc geometry (nibbles of md5(text), oracle formulas inline below):
  * n_frames = 1 + nib0 % 12, width = 4 + nib1 % 2, height = 4 + nib2 % 4.
  * Even doc_id frames encode as BMP, odd as PPM — both parsers sit in the
  * sf0.01 oracle path. Pixel (x,y) of frame i takes channels r,g,b from
  * bytes 3x, 3x+1, 3x+2 of md5(cell(i,y)) where cell(i,y) is the character
  * slice of `text` at index (i*height + y), stride = max(1,
  * clen / (n_frames*height)).
  */
object MediaSynth {

  /** Geometry moduli — single source for Scala and the oracle SQL. */
  val NFramesMod = 12
  val WidthMod = 2 // width in 4..5 (≤5: one md5 = 16 bytes covers 3*5 channels)
  val HeightMod = 4 // height in 4..7

  /** One synthesized media document: a real multi-frame byte payload. */
  final case class VideoDoc(doc_id: Long, video: Array[Byte], fmt: String)

  /** Per-frame decode features: geometry, quadrant luma sums (exact
    * integers — quadrant q = 2*[2y>=h] + [2x>=w]), total luma. */
  final case class FrameStats(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                              s0: Long, s1: Long, s2: Long, s3: Long, luma_sum: Long)

  /** Decode audit row: geometry + container byte arithmetic. */
  final case class VideoMeta(doc_id: Long, fmt: String, width: Int, height: Int,
                             n_frames: Int, container_bytes: Int, luma_sum: Long)

  private def hexNib(md: MessageDigest, s: String, k: Int): Int = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val b = d(k / 2) & 0xff
    if (k % 2 == 0) b >> 4 else b & 0xf
  }

  /** Pixels of frame i for a doc: channels from md5 of per-row cells. */
  private[graft] def framePixels(md: MessageDigest, text: String, i: Int,
                          w: Int, h: Int, stride: Int): ImageCodec.Image = {
    val n = w * h
    val r = new Array[Int](n); val g = new Array[Int](n); val b = new Array[Int](n)
    var y = 0
    while (y < h) {
      val from = math.min((i * h + y) * stride, text.length)
      val cell = text.substring(from, math.min(from + stride, text.length))
      md.reset()
      val d = md.digest(cell.getBytes(StandardCharsets.UTF_8))
      var x = 0
      while (x < w) {
        val p = y * w + x
        r(p) = d(3 * x) & 0xff
        g(p) = d(3 * x + 1) & 0xff
        b(p) = d(3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(w, h, r, g, b)
  }

  private[graft] def geom(md: MessageDigest, text: String): (Int, Int, Int, Int) = {
    val nf = 1 + hexNib(md, text, 0) % NFramesMod
    val w = 4 + hexNib(md, text, 1) % WidthMod
    val h = 4 + hexNib(md, text, 2) % HeightMod
    val stride = math.max(1, text.length / (nf * h))
    (nf, w, h, stride)
  }

  /** Synthesize the per-doc video payload: REAL encoded bytes. */
  def synthVideos(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, w, h, stride) = geom(md, text)
        val bmp = docId % 2 == 0
        val frames = (0 until nf).map { i =>
          val img = framePixels(md, text, i, w, h, stride)
          if (bmp) ImageCodec.encodeBmp(img) else ImageCodec.encodePpm(img, s"f$i")
        }
        val total = frames.map(_.length).sum
        val out = new Array[Byte](total)
        var off = 0
        frames.foreach { f => System.arraycopy(f, 0, out, off, f.length); off += f.length }
        VideoDoc(docId, out, if (bmp) "bmp" else "ppm")
      }
    }
  }

  private def quadSums(img: ImageCodec.Image): (Long, Long, Long, Long, Long) = {
    var s0 = 0L; var s1 = 0L; var s2 = 0L; var s3 = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val l = img.luma(y * img.width + x)
        val q = 2 * (if (2 * y >= img.height) 1 else 0) + (if (2 * x >= img.width) 1 else 0)
        q match {
          case 0 => s0 += l
          case 1 => s1 += l
          case 2 => s2 += l
          case _ => s3 += l
        }
        x += 1
      }
      y += 1
    }
    (s0, s1, s2, s3, s0 + s1 + s2 + s3)
  }

  /** REAL-decode path: parse the video container frame by frame, emit
    * per-frame quadrant luma sums. */
  def decodeFrameStats(videos: Dataset[VideoDoc]): Dataset[FrameStats] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.flatMap { v =>
      ImageCodec.decodeFrames(v.video).iterator.zipWithIndex.map { case (img, i) =>
        val (s0, s1, s2, s3, tot) = quadSums(img)
        FrameStats(v.doc_id, i, img.width, img.height, s0, s1, s2, s3, tot)
      }
    }
  }

  /** REAL-decode audit: per-doc geometry, frame count, container byte
    * length (the BMP padding / PPM header arithmetic), total luma. */
  def decodeVideoMeta(videos: Dataset[VideoDoc]): Dataset[VideoMeta] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.map { v =>
      val frames = ImageCodec.decodeFrames(v.video)
      val head = frames.head
      val tot = frames.map(f => quadSums(f)._5).sum
      VideoMeta(v.doc_id, v.fmt, head.width, head.height, frames.size, v.video.length, tot)
    }
  }

  /** Animated-GIF variant of [[synthVideos]]: identical geometry and
    * pixels, but the payload is ONE real GIF89a file per doc — palette
    * index = integer luma (the 256-gray ramp), so the md5-pixel oracles
    * gate the LZW round trip itself. */
  def synthGifVideos(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, w, h, stride) = geom(md, text)
        val frames = (0 until nf).map(i => framePixels(md, text, i, w, h, stride))
        VideoDoc(docId, GifCodec.encodeGif(frames), "gif")
      }
    }
  }

  /** PNG variant of [[synthVideos]]: one concatenated-PNG container per
    * doc (each frame its own CRC-framed, DEFLATE-compressed image; the
    * encoder cycles the filter type per row so decode reconstructs
    * through all five PNG filters). Pixels = the md5 luma plane. */
  def synthPngVideos(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, w, h, stride) = geom(md, text)
        val frames = (0 until nf).map(i => framePixels(md, text, i, w, h, stride))
        VideoDoc(docId, frames.map(PngCodec.encodePng).reduce(_ ++ _), "png")
      }
    }
  }

  /** MIXED-format variant: the per-doc container format cycles
    * doc_id % 4 → BMP frames / PPM frames / animated GIF / concatenated
    * PNGs — the "universal reader" corpus a real multimodal lake presents.
    * Pixels identical to [[synthVideos]] in every branch (PNG/GIF carry
    * luma; BMP/PPM carry RGB whose luma matches), so one pixel oracle
    * covers all four codecs. */
  def synthMixedVideos(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, w, h, stride) = geom(md, text)
        val frames = (0 until nf).map(i => framePixels(md, text, i, w, h, stride))
        (docId % 4) match {
          case 0 => VideoDoc(docId,
            frames.map(ImageCodec.encodeBmp).reduce(_ ++ _), "bmp")
          case 1 => VideoDoc(docId,
            frames.zipWithIndex.map { case (f, i) => ImageCodec.encodePpm(f, s"f$i") }
              .reduce(_ ++ _), "ppm")
          case 2 => VideoDoc(docId, GifCodec.encodeGif(frames), "gif")
          case _ => VideoDoc(docId,
            frames.map(PngCodec.encodePng).reduce(_ ++ _), "png")
        }
      }
    }
  }

  /** One channel-histogram cell of a doc's decoded pixels. */
  final case class ChannelBin(doc_id: Long, channel: String, bin: Int, n: Long)

  /** REAL-decode color profile: per-doc histogram of each RGB channel over
    * ALL frames' pixels (bin = v * bins / 256, truncating). Channel-exact:
    * a BGR/RGB swap moves counts between the r and b histograms even when
    * luma-based audits happen to cancel. */
  def decodeChannelHist(videos: Dataset[VideoDoc], bins: Int = 4): Dataset[ChannelBin] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.flatMap { v =>
      val counts = Array.ofDim[Long](3, bins)
      ImageCodec.decodeFrames(v.video).foreach { img =>
        val n = img.width * img.height
        var i = 0
        while (i < n) {
          counts(0)(img.r(i) * bins / 256) += 1
          counts(1)(img.g(i) * bins / 256) += 1
          counts(2)(img.b(i) * bins / 256) += 1
          i += 1
        }
      }
      for {
        (ch, ci) <- Seq(("r", 0), ("g", 1), ("b", 2))
        b <- 0 until bins
      } yield ChannelBin(v.doc_id, ch, b, counts(ci)(b))
    }
  }

  /** Sampled-decode audit row: frame/byte budget + sampled-frame luma. */
  final case class SampledStats(doc_id: Long, n_frames: Int, n_decoded: Int,
                                bytes_total: Int, bytes_decoded: Int, luma_sum: Long)

  /** Frame sampling with DECODE PUSHDOWN: keep every `everyK`-th frame of
    * a BMP/PPM container, but SKIP the others via header-only length
    * peeks ([[ImageCodec.peekFrameLength]]) — their pixels are never
    * decoded. Emits the budget audit (frames/bytes decoded vs total) plus
    * the sampled frames' total luma, so the oracle gates both the
    * sampling arithmetic and the skip-walk correctness (a wrong peek
    * length desynchronizes every later frame). */
  def decodeSampledStats(videos: Dataset[VideoDoc], everyK: Int): Dataset[SampledStats] = {
    require(everyK > 0, "everyK must be positive")
    val spark = videos.sparkSession
    import spark.implicits._
    videos.map { v =>
      var p = 0; var i = 0; var nDec = 0; var bDec = 0; var luma = 0L
      while (p < v.video.length) {
        val len = ImageCodec.peekFrameLength(v.video, p)
        if (i % everyK == 0) {
          val img =
            if (v.video(p) == 'B') ImageCodec.decodeBmp(v.video, p)._1
            else ImageCodec.decodePpm(v.video, p)._1
          var j = 0
          val n = img.width * img.height
          while (j < n) { luma += img.luma(j); j += 1 }
          nDec += 1; bDec += len
        }
        p += len; i += 1
      }
      SampledStats(v.doc_id, i, nDec, v.video.length, bDec, luma)
    }
  }

  // ------------------------------------------------------- JPEG fixtures --
  // Block-constant pixels: every 8x8 block of a frame carries ONE value, so
  // baseline JPEG with quantizer 1 decodes it integer-exactly (DC-only
  // blocks — see JpegCodec's losslessness contract) and the md5 oracle can
  // gate the real entropy-coded decode. Geometry from the same md5 nibbles
  // as the other fixtures; block values from md5 over text slices.

  /** JPEG geometry moduli + cell formula constants — single source for
    * Scala and the oracle SQL. */
  val JpegNFramesMod = 6
  val JpegBwMod = 2 // blocks across in 2..3 (image width 16..24)
  val JpegBhMod = 2 // block rows in 2..3
  val JpegMcuMod = 2 // 4:2:0 MCUs per side in 1..2 (image 16..32 px)
  val JpegCellLen = 13
  val JpegYMult = 7
  val JpegChromaMult = 11

  private[graft] def jpegGeom(md: MessageDigest, text: String): (Int, Int, Int) =
    (1 + hexNib(md, text, 0) % JpegNFramesMod,
      2 + hexNib(md, text, 1) % JpegBwMod,
      2 + hexNib(md, text, 2) % JpegBhMod)

  /** Restart-interval policy for every JPEG fixture family (r15 verdict
    * #4): a deterministic third of the docs carry DRI=2 + RSTn markers,
    * so the decoder's restart path (marker sequencing, predictor resets,
    * bit realignment) is exercised by the ORACLE-GATED pipeline each
    * round, not only by JpegCodecSpec. Pixels are unchanged — the oracles
    * re-derive pixel values from text, independent of stream framing. */
  private[graft] def jpegDri(docId: Long): Int = if (docId % 3 == 0) 2 else 0

  private[graft] def jpeg420Geom(md: MessageDigest, text: String): (Int, Int, Int) =
    (1 + hexNib(md, text, 0) % JpegNFramesMod,
      1 + hexNib(md, text, 1) % JpegMcuMod,
      1 + hexNib(md, text, 2) % JpegMcuMod)

  /** Byte `k` of md5 over the text cell for `cellIdx` (oracle mirror:
    * substr(text, ((cellIdx*mult) % greatest(1,clen)) + 1, 13)). */
  private def cellByte(md: MessageDigest, text: String, cellIdx: Int,
                       mult: Int, k: Int): Int = {
    val clen = math.max(1, text.length)
    val from = math.min((cellIdx * mult) % clen, text.length)
    val cell = text.substring(from, math.min(from + JpegCellLen, text.length))
    md.reset()
    md.digest(cell.getBytes(StandardCharsets.UTF_8))(k) & 0xff
  }

  /** Grayscale JPEG container: one baseline JPEG per frame, concatenated
    * (same MJPEG shape as the other containers); block (by,bx) of frame i
    * carries value md5-byte0 of cell (i·bh+by)·bw+bx. */
  def synthJpegVideos(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, bw, bh) = jpegGeom(md, text)
        val frames = (0 until nf).map { i =>
          val blocks = Array.tabulate(bh * bw)(j =>
            cellByte(md, text, i * bh * bw + j, JpegYMult, 0))
          JpegCodec.encodeJpegGray(blocks, bw, bh, dri = jpegDri(docId))
        }
        VideoDoc(docId, frames.reduce(_ ++ _), "jpg")
      }
    }
  }

  /** One decoded JPEG block: frame/grid position + the block's uniform
    * value (uniformity is REQUIRED during decode — it is the proof that
    * the DC-only pipeline reproduced the fixture exactly). */
  final case class JpegBlock(doc_id: Long, frame_idx: Int, by: Int, bx: Int, v: Int)

  /** REAL-decode path for [[synthJpegVideos]]: walk the concatenated
    * JPEGs, decode each through the full baseline pipeline (Huffman →
    * dequant → IDCT), assert per-block uniformity, emit block values. */
  def decodeJpegBlockStats(videos: Dataset[VideoDoc]): Dataset[JpegBlock] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.flatMap { vd =>
      val out = Seq.newBuilder[JpegBlock]
      var p = 0
      var fi = 0
      while (p < vd.video.length) {
        val (img, len) = JpegCodec.decodeJpeg(vd.video, p)
        val bw = img.width / 8; val bh = img.height / 8
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val v0 = img.r((by * 8) * img.width + bx * 8)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val i = (by * 8 + y) * img.width + bx * 8 + x
                require(img.r(i) == v0 && img.g(i) == v0 && img.b(i) == v0,
                  s"JPEG: block ($by,$bx) not uniform — DC-only decode diverged")
                x += 1
              }
              y += 1
            }
            out += JpegBlock(vd.doc_id, fi, by, bx, v0)
            bx += 1
          }
          by += 1
        }
        p += len
        fi += 1
      }
      out.result()
    }
  }

  /** Cross-format parity payloads: the SAME gray block-constant pixels
    * encoded per-doc BOTH as concatenated JPEGs and as concatenated BMPs
    * (r=g=b=v, luma(v,v,v)=v exactly). */
  final case class ParityStats(doc_id: Long, n_frames: Int,
                               luma_jpeg: Long, luma_bmp: Long)

  /** Encode-decode both paths and sum decoded luma per doc: the
    * entropy-coded pipeline and the flat-raster pipeline must agree
    * pixel-for-pixel, and BOTH must agree with the md5 oracle. */
  def jpegBmpParity(docs: DataFrame): Dataset[ParityStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, bw, bh) = jpegGeom(md, text)
        val blockGrids = (0 until nf).map { i =>
          Array.tabulate(bh * bw)(j => cellByte(md, text, i * bh * bw + j, JpegYMult, 0))
        }
        val jpegBytes = blockGrids
          .map(bl => JpegCodec.encodeJpegGray(bl, bw, bh, dri = jpegDri(docId)))
          .reduce(_ ++ _)
        val bmpBytes = blockGrids.map { bl =>
          val w = 8 * bw; val h = 8 * bh
          val ch = Array.tabulate(w * h)(p => bl((p / w / 8) * bw + (p % w) / 8))
          ImageCodec.encodeBmp(ImageCodec.Image(w, h, ch, ch.clone(), ch.clone()))
        }.reduce(_ ++ _)
        def lumaSum(bytes: Array[Byte]): Long = {
          var s = 0L
          ImageCodec.decodeFrames(bytes).foreach { img =>
            var i = 0
            val n = img.width * img.height
            while (i < n) { s += img.luma(i); i += 1 }
          }
          s
        }
        ParityStats(docId, nf, lumaSum(jpegBytes), lumaSum(bmpBytes))
      }
    }
  }

  /** Color JPEG container at Y sampling (hy, vy): Y constant per 8x8
    * block (md5 byte 0, cell stride [[JpegYMult]]), Cb/Cr constant per
    * MCU (md5 bytes 1 and 2, stride [[JpegChromaMult]]). (2,2) = 4:2:0,
    * (2,1) = 4:2:2, (1,1) = 4:4:4 — one fixture family covers every
    * sampling the decoder accepts. */
  def synthJpegYccVideos(docs: DataFrame, hy: Int, vy: Int, fmt: String): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, mw, mh) = jpeg420Geom(md, text)
        val bpm = hy * vy // Y blocks per MCU
        val frames = (0 until nf).map { i =>
          val yB = Array.tabulate(bpm * mw * mh)(j =>
            cellByte(md, text, i * bpm * mw * mh + j, JpegYMult, 0))
          val cb = Array.tabulate(mw * mh)(j =>
            cellByte(md, text, i * mw * mh + j, JpegChromaMult, 1))
          val cr = Array.tabulate(mw * mh)(j =>
            cellByte(md, text, i * mw * mh + j, JpegChromaMult, 2))
          JpegCodec.encodeJpegYcc(yB, cb, cr, mw, mh, hy, vy, dri = jpegDri(docId))
        }
        VideoDoc(docId, frames.reduce(_ ++ _), fmt)
      }
    }
  }

  /** The x389 fixture shape: 4:2:0. */
  def synthJpeg420Videos(docs: DataFrame): Dataset[VideoDoc] =
    synthJpegYccVideos(docs, 2, 2, "jpg420")

  /** Per-frame RGB channel sums after the full color path (4:2:0 decode →
    * box upsample → JFIF matrix) — the oracle recomputes the same sums
    * from the Y/Cb/Cr block formulas and the SAME floor(x+0.5) matrix. */
  final case class JpegRgb(doc_id: Long, frame_idx: Int,
                           r_sum: Long, g_sum: Long, b_sum: Long)

  def decodeJpeg420ChannelSums(videos: Dataset[VideoDoc]): Dataset[JpegRgb] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.flatMap { vd =>
      val out = Seq.newBuilder[JpegRgb]
      var p = 0
      var fi = 0
      while (p < vd.video.length) {
        val (img, len) = JpegCodec.decodeJpeg(vd.video, p)
        var rs = 0L; var gs = 0L; var bs = 0L
        var i = 0
        val n = img.width * img.height
        while (i < n) { rs += img.r(i); gs += img.g(i); bs += img.b(i); i += 1 }
        out += JpegRgb(vd.doc_id, fi, rs, gs, bs)
        p += len
        fi += 1
      }
      out.result()
    }
  }

  /** Length-prefixed MJPEG container: [len:4 LE][baseline JPEG] per
    * frame — the AVI-style index shape that makes frame SAMPLING possible
    * for an entropy-coded codec (a bare JPEG concatenation can only find
    * frame N by Huffman-walking frames 0..N-1; the index prefix is what a
    * real media lake stores so a decode-budget sampler can seek). Same
    * grayscale block-constant pixels as [[synthJpegVideos]]. */
  def synthMjpegIndexed(docs: DataFrame): Dataset[VideoDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, text) =>
        val (nf, bw, bh) = jpegGeom(md, text)
        val frames = (0 until nf).map { i =>
          val blocks = Array.tabulate(bh * bw)(j =>
            cellByte(md, text, i * bh * bw + j, JpegYMult, 0))
          val jp = JpegCodec.encodeJpegGray(blocks, bw, bh, dri = jpegDri(docId))
          Array[Byte]((jp.length & 0xff).toByte, ((jp.length >> 8) & 0xff).toByte,
            ((jp.length >> 16) & 0xff).toByte, ((jp.length >> 24) & 0xff).toByte) ++ jp
        }
        VideoDoc(docId, frames.reduce(_ ++ _), "mjpgi")
      }
    }
  }

  /** Sampled-decode audit for [[synthMjpegIndexed]]: decode every
    * `everyK`-th frame through the full baseline JPEG pipeline, SKIP the
    * others via the index prefix (their entropy bytes are never read).
    * The skipped-frame walk is gated implicitly: a wrong length prefix
    * desynchronizes the next decode (bad SOI → loud), and each decoded
    * frame's consumed length is cross-checked against its prefix. */
  final case class MjpegSample(doc_id: Long, n_frames: Int, n_decoded: Int,
                               luma_sum: Long)

  def decodeMjpegSampled(videos: Dataset[VideoDoc], everyK: Int): Dataset[MjpegSample] = {
    require(everyK > 0, "everyK must be positive")
    val spark = videos.sparkSession
    import spark.implicits._
    videos.map { v =>
      var p = 0; var i = 0; var nDec = 0; var luma = 0L
      while (p < v.video.length) {
        require(p + 4 <= v.video.length, "mjpgi: truncated length prefix")
        val len = (v.video(p) & 0xff) | ((v.video(p + 1) & 0xff) << 8) |
          ((v.video(p + 2) & 0xff) << 16) | ((v.video(p + 3) & 0xff) << 24)
        require(len > 0 && p + 4 + len <= v.video.length, s"mjpgi: bad frame length $len")
        if (i % everyK == 0) {
          val (img, consumed) = JpegCodec.decodeJpeg(v.video, p + 4)
          require(consumed == len, s"mjpgi: prefix $len != decoded length $consumed")
          var j = 0
          val n = img.width * img.height
          while (j < n) { luma += img.luma(j); j += 1 }
          nDec += 1
        }
        p += 4 + len; i += 1
      }
      MjpegSample(v.doc_id, i, nDec, luma)
    }
  }

  /** dHash geometry shared with the oracle: resize frame 0 to DhashW x
    * DhashH (nearest-neighbor), 15 gradient bits over row-major lumas. */
  val DhashW = 4
  val DhashH = 4

  /** REAL-decode perceptual hash: parse frame 0, nearest-resize to 4x4,
    * dHash over the resized lumas — the pipeline real pHash runs. */
  def dhashReal(videos: Dataset[VideoDoc]): Dataset[Multimodal.MediaHash] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.map { v =>
      val frame0 =
        if (v.video(0) == 'B') ImageCodec.decodeBmp(v.video)._1
        else if (v.video(0) == 'G') GifCodec.decodeGif(v.video)._1.head
        else if ((v.video(0) & 0xff) == 0x89) PngCodec.decodePng(v.video)._1
        else ImageCodec.decodePpm(v.video)._1
      val small = ImageCodec.resizeNearest(frame0, DhashW, DhashH)
      val n = DhashW * DhashH
      var ph = 0
      var p = 0
      while (p < n - 1) {
        if (small.luma(p) > small.luma(p + 1)) ph |= 1 << p
        p += 1
      }
      Multimodal.MediaHash(v.doc_id, ph)
    }
  }
}
