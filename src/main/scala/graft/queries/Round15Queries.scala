package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaSynth
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 wave 1: the JPEG tier (r14 verdict "Next round #2") — the
  * entropy-coded codec joins the oracle-gated family. Fixtures are
  * block-constant (DC-only blocks decode integer-exactly under quantizer
  * 1, see [[graft.multimodal.JpegCodec]]), so the DuckDB oracle re-derives
  * the exact pixels from md5 formulas while Spark decodes real
  * Huffman-coded bytes: a bit-packing, stuffing, canonical-table, zigzag,
  * dequant, IDCT, upsampling, or color-matrix defect fails the hash. */
object Round15Queries {

  private val Hex = "'0123456789abcdef'"
  /** Byte `k` (0-based) of md5 over SQL string expression `e`. */
  private def md5Byte(e: String, k: Int): String = {
    val p1 = 2 * k + 1
    s"((strpos($Hex, substr(md5($e), $p1, 1)) - 1) * 16 " +
      s"+ (strpos($Hex, substr(md5($e), ${p1 + 1}, 1)) - 1))"
  }
  private def nib(expr: String, k: Int) =
    s"(strpos($Hex, substr(md5($expr), ${k + 1}, 1)) - 1)"

  /** Text cell for block `cellIdx` at stride `mult` (MediaSynth.cellByte
    * mirror): substr(text, ((cellIdx*mult) % greatest(1,clen)) + 1, 13). */
  private def cellExpr(cellIdx: String, mult: Int): String =
    s"substr(text, CAST((($cellIdx) * $mult) % clen + 1 AS INTEGER), ${MediaSynth.JpegCellLen})"

  // ---------------------------------------------------------------- x387 --

  /** x387: grayscale JPEG decode, block-exact. Every 8x8 block of every
    * frame decodes through the full baseline pipeline (canonical Huffman,
    * 0xFF00 un-stuffing, zigzag dequant, IDCT) and must come back UNIFORM
    * at the md5-derived value — the strongest possible oracle for a lossy
    * container: byte-exact pixels, one row per block. */
  def jpegBlockDecode(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.decodeJpegBlockStats(
      MediaSynth.synthJpegVideos(Tables.documents(spark, dir)))
      .toDF().orderBy("doc_id", "frame_idx", "by", "bx")

  private val jpegBlockOracle =
    s"""WITH m AS (SELECT doc_id, text, greatest(1, length(text)) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.JpegNFramesMod} AS nf,
       |             2 + ${nib("text", 1)} % ${MediaSynth.JpegBwMod} AS bw,
       |             2 + ${nib("text", 2)} % ${MediaSynth.JpegBhMod} AS bh
       |           FROM documents),
       |fr AS (SELECT doc_id, text, clen, bw, bh, unnest(range(0, nf)) AS i FROM m),
       |rw AS (SELECT *, unnest(range(0, bh)) AS by FROM fr),
       |cl AS (SELECT *, unnest(range(0, bw)) AS bx FROM rw)
       |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |       CAST(by AS INTEGER) AS by, CAST(bx AS INTEGER) AS bx,
       |       CAST(${md5Byte(cellExpr("(i * bh + by) * bw + bx", MediaSynth.JpegYMult), 0)} AS INTEGER) AS v
       |FROM cl
       |ORDER BY doc_id, frame_idx, by, bx""".stripMargin

  // ---------------------------------------------------------------- x388 --

  /** x388: JPEG-vs-BMP cross-format parity (the x383 pattern for the
    * entropy-coded tier): identical gray pixels through the Huffman
    * pipeline and the flat-raster pipeline must sum to identical decoded
    * luma — and both must equal the oracle's formula value. */
  def jpegBmpParity(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.jpegBmpParity(Tables.documents(spark, dir))
      .toDF().orderBy("doc_id")

  private val jpegBmpParityOracle =
    s"""WITH m AS (SELECT doc_id, text, greatest(1, length(text)) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.JpegNFramesMod} AS nf,
       |             2 + ${nib("text", 1)} % ${MediaSynth.JpegBwMod} AS bw,
       |             2 + ${nib("text", 2)} % ${MediaSynth.JpegBhMod} AS bh
       |           FROM documents),
       |fr AS (SELECT doc_id, text, clen, nf, bw, bh, unnest(range(0, nf)) AS i FROM m),
       |rw AS (SELECT *, unnest(range(0, bh)) AS by FROM fr),
       |cl AS (SELECT *, unnest(range(0, bw)) AS bx FROM rw),
       |bv AS (SELECT doc_id, nf,
       |         ${md5Byte(cellExpr("(i * bh + by) * bw + bx", MediaSynth.JpegYMult), 0)} AS v
       |       FROM cl)
       |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
       |       CAST(64 * sum(v) AS BIGINT) AS luma_jpeg,
       |       CAST(64 * sum(v) AS BIGINT) AS luma_bmp
       |FROM bv GROUP BY doc_id, nf
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x389 --

  /** x389: 4:2:0 color JPEG — three interleaved components, per-component
    * DC predictors and Huffman tables, box chroma upsampling, JFIF
    * YCbCr→RGB with floor(x+0.5). The oracle recomputes the per-frame RGB
    * channel sums from the Y/Cb/Cr block formulas through the SAME matrix
    * (forced DOUBLE arithmetic — both engines run IEEE-754 on identical
    * literals, so the rounding is bit-identical). */
  def jpeg420ColorDecode(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.decodeJpeg420ChannelSums(
      MediaSynth.synthJpeg420Videos(Tables.documents(spark, dir)))
      .toDF().orderBy("doc_id", "frame_idx")

  private def dbl(x: String) = s"CAST($x AS DOUBLE)"
  private val jpeg420Oracle = {
    val yv = md5Byte(cellExpr("(i * 4 * mw * mh) + by * (2 * mw) + bx", MediaSynth.JpegYMult), 0)
    val cbv = md5Byte(cellExpr("(i * mw * mh) + (by // 2) * mw + (bx // 2)", MediaSynth.JpegChromaMult), 1)
    val crv = md5Byte(cellExpr("(i * mw * mh) + (by // 2) * mw + (bx // 2)", MediaSynth.JpegChromaMult), 2)
    s"""WITH m AS (SELECT doc_id, text, greatest(1, length(text)) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.JpegNFramesMod} AS nf,
       |             1 + ${nib("text", 1)} % ${MediaSynth.JpegMcuMod} AS mw,
       |             1 + ${nib("text", 2)} % ${MediaSynth.JpegMcuMod} AS mh
       |           FROM documents),
       |fr AS (SELECT doc_id, text, clen, mw, mh, unnest(range(0, nf)) AS i FROM m),
       |rw AS (SELECT *, unnest(range(0, 2 * mh)) AS by FROM fr),
       |cl AS (SELECT *, unnest(range(0, 2 * mw)) AS bx FROM rw),
       |ycc AS (SELECT doc_id, i, $yv AS y, $cbv AS cb, $crv AS cr FROM cl),
       |rgb AS (SELECT doc_id, i,
       |          least(255, greatest(0, CAST(floor(y + ${dbl("1.402")} * (cr - 128) + 0.5) AS INTEGER))) AS r,
       |          least(255, greatest(0, CAST(floor(y - ${dbl("0.344136")} * (cb - 128) - ${dbl("0.714136")} * (cr - 128) + 0.5) AS INTEGER))) AS g,
       |          least(255, greatest(0, CAST(floor(y + ${dbl("1.772")} * (cb - 128) + 0.5) AS INTEGER))) AS b
       |        FROM ycc)
       |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |       CAST(64 * sum(r) AS BIGINT) AS r_sum,
       |       CAST(64 * sum(g) AS BIGINT) AS g_sum,
       |       CAST(64 * sum(b) AS BIGINT) AS b_sum
       |FROM rgb GROUP BY doc_id, i
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  // --------------------------------------------------------- x391 / x392 --

  /** Shared oracle for the color-sampling family: per-frame RGB channel
    * sums for Y sampling (hy, vy) — the Y grid is (vy·mh) x (hy·mw)
    * blocks, chroma constant per MCU at (by//vy, bx//hy). x389 is the
    * (2,2) member; these parameterize the same formulas. */
  private def jpegYccOracle(hy: Int, vy: Int): String = {
    val bpm = hy * vy
    val yv = md5Byte(cellExpr(s"(i * $bpm * mw * mh) + by * ($hy * mw) + bx", MediaSynth.JpegYMult), 0)
    val cbv = md5Byte(cellExpr(s"(i * mw * mh) + (by // $vy) * mw + (bx // $hy)", MediaSynth.JpegChromaMult), 1)
    val crv = md5Byte(cellExpr(s"(i * mw * mh) + (by // $vy) * mw + (bx // $hy)", MediaSynth.JpegChromaMult), 2)
    s"""WITH m AS (SELECT doc_id, text, greatest(1, length(text)) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.JpegNFramesMod} AS nf,
       |             1 + ${nib("text", 1)} % ${MediaSynth.JpegMcuMod} AS mw,
       |             1 + ${nib("text", 2)} % ${MediaSynth.JpegMcuMod} AS mh
       |           FROM documents),
       |fr AS (SELECT doc_id, text, clen, mw, mh, unnest(range(0, nf)) AS i FROM m),
       |rw AS (SELECT *, unnest(range(0, $vy * mh)) AS by FROM fr),
       |cl AS (SELECT *, unnest(range(0, $hy * mw)) AS bx FROM rw),
       |ycc AS (SELECT doc_id, i, $yv AS y, $cbv AS cb, $crv AS cr FROM cl),
       |rgb AS (SELECT doc_id, i,
       |          least(255, greatest(0, CAST(floor(y + ${dbl("1.402")} * (cr - 128) + 0.5) AS INTEGER))) AS r,
       |          least(255, greatest(0, CAST(floor(y - ${dbl("0.344136")} * (cb - 128) - ${dbl("0.714136")} * (cr - 128) + 0.5) AS INTEGER))) AS g,
       |          least(255, greatest(0, CAST(floor(y + ${dbl("1.772")} * (cb - 128) + 0.5) AS INTEGER))) AS b
       |        FROM ycc)
       |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |       CAST(64 * sum(r) AS BIGINT) AS r_sum,
       |       CAST(64 * sum(g) AS BIGINT) AS g_sum,
       |       CAST(64 * sum(b) AS BIGINT) AS b_sum
       |FROM rgb GROUP BY doc_id, i
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** x391: 4:2:2 — two Y blocks per MCU share one chroma pair; the
    * horizontal-only box upsample is the branch 4:2:0 never runs. */
  def jpeg422ColorDecode(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.decodeJpeg420ChannelSums(
      MediaSynth.synthJpegYccVideos(Tables.documents(spark, dir), 2, 1, "jpg422"))
      .toDF().orderBy("doc_id", "frame_idx")

  /** x392: 4:4:4 — no subsampling at all; every component block-aligned,
    * the MCU is one block per component and the upsample is the identity
    * (so a subsampling-index bug that 4:2:0/4:2:2 happen to mask shows
    * here, and vice versa). */
  def jpeg444ColorDecode(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.decodeJpeg420ChannelSums(
      MediaSynth.synthJpegYccVideos(Tables.documents(spark, dir), 1, 1, "jpg444"))
      .toDF().orderBy("doc_id", "frame_idx")

  // ---------------------------------------------------------------- x390 --

  private val MjpegK = 3

  /** x390: decode-budget pushdown for the ENTROPY-CODED tier (x386's
    * story, harder format): a bare JPEG concatenation can only locate
    * frame N by Huffman-walking everything before it, so the container
    * carries an AVI-style length index — the sampler decodes every 3rd
    * frame and skips the rest via the prefix, never reading their entropy
    * bytes. Decoded lengths are cross-checked against the index, so a
    * desynchronized walk fails loudly; the sampled luma and counts are
    * oracle-gated from the md5 block formulas. */
  def mjpegSampledDecode(spark: SparkSession, dir: String): DataFrame =
    MediaSynth.decodeMjpegSampled(
      MediaSynth.synthMjpegIndexed(Tables.documents(spark, dir)), MjpegK)
      .toDF().orderBy("doc_id")

  private val mjpegSampledOracle =
    s"""WITH m AS (SELECT doc_id, text, greatest(1, length(text)) AS clen,
       |             1 + ${nib("text", 0)} % ${MediaSynth.JpegNFramesMod} AS nf,
       |             2 + ${nib("text", 1)} % ${MediaSynth.JpegBwMod} AS bw,
       |             2 + ${nib("text", 2)} % ${MediaSynth.JpegBhMod} AS bh
       |           FROM documents),
       |fr AS (SELECT doc_id, text, clen, nf, bw, bh, unnest(range(0, nf)) AS i FROM m),
       |sfr AS (SELECT * FROM fr WHERE i % $MjpegK = 0),
       |rw AS (SELECT *, unnest(range(0, bh)) AS by FROM sfr),
       |cl AS (SELECT *, unnest(range(0, bw)) AS bx FROM rw),
       |bv AS (SELECT doc_id, nf,
       |         ${md5Byte(cellExpr("(i * bh + by) * bw + bx", MediaSynth.JpegYMult), 0)} AS v
       |       FROM cl)
       |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
       |       CAST((nf + ${MjpegK - 1}) // $MjpegK AS INTEGER) AS n_decoded,
       |       CAST(64 * sum(v) AS BIGINT) AS luma_sum
       |FROM bv GROUP BY doc_id, nf
       |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x387_jpeg_block_decode",
      "baseline JPEG grayscale decode, block-exact: real Huffman/zigzag/IDCT pipeline vs md5 pixel oracle (X7)",
      jpegBlockDecode, Some(jpegBlockOracle)),
    QueryDef("x388_jpeg_bmp_parity",
      "cross-format parity: same pixels through the entropy-coded (JPEG) and flat-raster (BMP) pipelines, decoded luma identical (X7)",
      jpegBmpParity, Some(jpegBmpParityOracle)),
    QueryDef("x389_jpeg420_color",
      "4:2:0 color JPEG: interleaved MCUs, per-component predictors, box upsampling, JFIF YCbCr->RGB — channel sums oracle-gated (X7)",
      jpeg420ColorDecode, Some(jpeg420Oracle)),
    QueryDef("x390_mjpeg_sampled_decode",
      "decode-budget pushdown for the entropy-coded tier: AVI-style length index lets the sampler skip 2/3 of JPEG frames unread (X7)",
      mjpegSampledDecode, Some(mjpegSampledOracle)),
    QueryDef("x391_jpeg422_color",
      "4:2:2 JPEG: two Y blocks per MCU, horizontal-only chroma upsample — the sampling branch 4:2:0 never runs (X7)",
      jpeg422ColorDecode, Some(jpegYccOracle(2, 1))),
    QueryDef("x392_jpeg444_color",
      "4:4:4 JPEG: no subsampling, identity upsample — isolates the color matrix from the sampling indexing (X7)",
      jpeg444ColorDecode, Some(jpegYccOracle(1, 1))))
}
