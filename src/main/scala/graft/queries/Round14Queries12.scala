package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 wave 12: decode-budget pushdown — the media twin of column
  * pruning: a frame sampler that never touches the pixels of skipped
  * frames. */
object Round14Queries12 {

  private val SampleK = 3

  /** x386: sampled decode with header-only skips — keep every 3rd frame
    * of the BMP/PPM container, skipping the rest via length peeks (BMP
    * bfSize / PPM header+3wh), and emit the budget audit: frames and
    * bytes decoded vs total, plus the sampled frames' luma sum. The
    * oracle recomputes the byte arithmetic from the format specs and the
    * sampled luma from the pixel CTEs — a wrong peek length would
    * desynchronize every subsequent frame and fail the hash. At 100 TB
    * this is the decode-budget story: a k=3 sampler reads ~1/3 of the
    * media bytes, not all of them. */
  def sampledDecodeBudget(spark: SparkSession, dir: String): DataFrame = {
    MediaSynth.decodeSampledStats(
      MediaSynth.synthVideos(Tables.documents(spark, dir)), SampleK)
      .toDF().orderBy("doc_id")
  }

  private val sampledDecodeOracle =
    MediaOracleSql.pixelCtes + s""",
       |fsz AS (SELECT doc_id, i,
       |          CASE WHEN doc_id % 2 = 0
       |               THEN 54 + (((3 * w + 3) // 4) * 4) * h
       |               ELSE 15 + length(CAST(i AS VARCHAR)) + 3 * w * h END AS fb
       |        FROM fr),
       |bud AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames,
       |          CAST(sum(CASE WHEN i % $SampleK = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_decoded,
       |          CAST(sum(fb) AS INTEGER) AS bytes_total,
       |          CAST(sum(CASE WHEN i % $SampleK = 0 THEN fb ELSE 0 END) AS INTEGER) AS bytes_decoded
       |        FROM fsz GROUP BY doc_id),
       |sl AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS luma_sum
       |       FROM lm WHERE i % $SampleK = 0 GROUP BY doc_id)
       |SELECT b.doc_id, b.n_frames, b.n_decoded, b.bytes_total, b.bytes_decoded,
       |       sl.luma_sum
       |FROM bud b JOIN sl ON sl.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x386_sampled_decode_budget",
      "frame sampling with decode pushdown: header-only length peeks skip 2/3 of the media bytes, budget + sampled luma oracle-gated (X7)",
      sampledDecodeBudget, Some(sampledDecodeOracle)))
}
