package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.{ImageCodec, MediaSynth}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 wave 1: the REAL-codec audit tier (r13 verdict "Next round #1").
  * x360 gates the full video decode — geometry, frame count, container byte
  * arithmetic (BMP 4-byte row padding / PPM variable-length headers), total
  * luma — and x361 gates the RIFF/WAVE chunk walker against a file with an
  * unknown chunk spliced in (odd-size, so the even-byte padding rule is in
  * the oracle path too). */
object Round14Queries1 {

  /** x360: per-doc decode audit over the real BMP/PPM video container.
    * container_bytes is what pins the byte-level encode: the oracle
    * recomputes the exact file sizes from the format specs (BMP:
    * 54 + rowpad(3w) * h per frame; PPM: 15 + digits(frame_idx) header +
    * 3wh per frame), so a padding or header-length defect fails here even
    * if the pixels happen to survive. Scale: one narrow mapPartitions,
    * zero shuffles before the final sort. */
  def videoDecodeMeta(spark: SparkSession, dir: String) = {
    MediaSynth.decodeVideoMeta(
      MediaSynth.synthVideos(Tables.documents(spark, dir)))
      .toDF().orderBy("doc_id")
  }

  private val videoDecodeMetaOracle =
    MediaOracleSql.pixelCtes + s""",
       |tot AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS luma_sum FROM lm GROUP BY doc_id),
       |geo AS (SELECT doc_id, nf, w, h FROM s)
       |SELECT g.doc_id,
       |       CASE WHEN g.doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
       |       CAST(g.w AS INTEGER) AS width, CAST(g.h AS INTEGER) AS height,
       |       CAST(g.nf AS INTEGER) AS n_frames,
       |       CAST(CASE WHEN g.doc_id % 2 = 0
       |            THEN g.nf * (54 + (((3 * g.w + 3) // 4) * 4) * g.h)
       |            ELSE 15 * g.nf + least(g.nf, 10) + 2 * greatest(g.nf - 10, 0)
       |                 + 3 * g.w * g.h * g.nf END AS INTEGER) AS container_bytes,
       |       t.luma_sum
       |FROM geo g JOIN tot t ON t.doc_id = g.doc_id
       |ORDER BY g.doc_id""".stripMargin

  /** One WAV payload per doc: canonical PCM-u8 encode of the UTF-8 text
    * bytes, with an unknown odd-sized LIST chunk SPLICED between `fmt `
    * and `data` — real files carry metadata chunks there, and a naive
    * 44-byte-offset reader mis-reads every one of them. */
  private def synthWav(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (docId, text) =>
        val pcm = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // the oracle computes energy/length from ascii() CODE POINTS, so
        // this tier (like x72) is only valid on the ASCII fixture — fail
        // LOUDLY on a multi-byte char instead of silently diverging
        require(pcm.length == text.length,
          s"doc $docId: non-ASCII text — x361's ascii() oracle does not apply")
        val canon = ImageCodec.encodeWav(pcm)
        val junk = "graftpd".getBytes(java.nio.charset.StandardCharsets.US_ASCII) // 7 bytes (odd)
        val out = new Array[Byte](canon.length + 8 + junk.length + 1)
        System.arraycopy(canon, 0, out, 0, 36) // RIFF..WAVE..fmt chunk
        out(36) = 'L'; out(37) = 'I'; out(38) = 'S'; out(39) = 'T'
        out(40) = junk.length.toByte // le32(7): low byte only, rest zero
        System.arraycopy(junk, 0, out, 44, junk.length)
        // out(44+7) left 0: the RIFF even-byte pad
        System.arraycopy(canon, 36, out, 52, canon.length - 36)
        // patch RIFF size (+16 for the spliced chunk incl. pad)
        val riff = (canon.length - 8) + 8 + junk.length + 1
        out(4) = (riff & 0xff).toByte; out(5) = ((riff >> 8) & 0xff).toByte
        out(6) = ((riff >> 16) & 0xff).toByte; out(7) = ((riff >> 24) & 0xff).toByte
        (docId, out)
      }.toDF("doc_id", "wav")
  }

  /** x361: WAV chunk-walk parity — decode the spliced file with the real
    * RIFF parser and emit per-doc PCM stats. The oracle knows the samples
    * are exactly the text's byte codes (ASCII fixture) and the container
    * is 60 + n bytes (44 canonical + 16 spliced), so a parser that
    * mis-walks chunks or forgets the odd-size pad diverges on every row. */
  def wavChunkWalk(spark: SparkSession, dir: String) = {
    import spark.implicits._
    synthWav(spark, dir).as[(Long, Array[Byte])].map { case (docId, wav) =>
      val pcm = ImageCodec.decodeWav(wav)
      var energy = 0L; var peak = 0; var i = 0
      while (i < pcm.samples.length) {
        val v = pcm.samples(i) & 0xff
        energy += v; if (v > peak) peak = v
        i += 1
      }
      (docId, pcm.sampleRate, pcm.samples.length, energy, peak, wav.length)
    }.toDF("doc_id", "sample_rate", "n_samples", "energy", "peak", "wav_bytes")
      .orderBy("doc_id")
  }

  private val wavChunkWalkOracle =
    s"""WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents)
       |SELECT doc_id, 8000 AS sample_rate, CAST(n AS INTEGER) AS n_samples,
       |       CAST(coalesce(list_sum(list_transform(range(1, n + 1),
       |              i -> ascii(substr(text, CAST(i AS INTEGER), 1)))), 0) AS BIGINT) AS energy,
       |       CAST(coalesce(list_max(list_transform(range(1, n + 1),
       |              i -> ascii(substr(text, CAST(i AS INTEGER), 1)))), 0) AS INTEGER) AS peak,
       |       CAST(60 + n AS INTEGER) AS wav_bytes
       |FROM c
       |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x360_video_decode_meta",
      "real BMP/PPM container decode audit: geometry, frame count, byte-exact container sizes, total luma (X7)",
      videoDecodeMeta, Some(videoDecodeMetaOracle)),
    QueryDef("x361_wav_chunk_walk",
      "RIFF/WAVE chunk-walk decode parity over a spliced unknown chunk (odd size + pad) (X7)",
      wavChunkWalk, Some(wavChunkWalkOracle)))
}
