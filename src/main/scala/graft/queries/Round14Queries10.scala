package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 10: the COMPRESSED-format tier — the same media pipeline
  * through real GIF89a/LZW payloads. The pixels are identical to the
  * BMP/PPM path (palette index = integer luma), so the existing md5-pixel
  * oracles gate the LZW implementation itself: a bit-packing, code-width,
  * sub-block, or table-rebuild defect diverges the decoded lumas and
  * fails the hash compare. */
object Round14Queries10 {

  /** x382: scene segmentation through the GIF/LZW decode — x75's exact
    * pipeline (quadrant luma sums, L1 cut threshold) over frames that
    * arrive LZW-compressed in one animated GIF per doc. Same oracle shape
    * as x75; what's new under test is the compressed codec in the decode
    * stage. */
  def gifSceneParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = MediaSynth.decodeFrameStats(
      MediaSynth.synthGifVideos(Tables.documents(spark, dir))).toDF()
    val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
    val dist = abs($"s0" - lag($"s0", 1).over(w)) + abs($"s1" - lag($"s1", 1).over(w)) +
      abs($"s2" - lag($"s2", 1).over(w)) + abs($"s3" - lag($"s3", 1).over(w))
    frames.withColumn("cut", (dist > ConnectorQueries.SceneTau).cast("int"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_frames"),
        (lit(1) + coalesce(sum($"cut"), lit(0L))).cast("int").as("n_scenes"),
        md5(array_join(
          transform(sort_array(collect_list(when($"cut" === 1, $"frame_idx"))),
            _.cast("string")), ","))
          .as("cuts_md5"))
      .orderBy("doc_id")
  }

  private val gifSceneOracle =
    ConnectorQueries.sceneCtes + s"""
       |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames,
       |       CAST(1 + coalesce(sum(cut), 0) AS INTEGER) AS n_scenes,
       |       md5(coalesce(string_agg(CASE WHEN cut = 1 THEN CAST(frame_idx AS VARCHAR) END, ',' ORDER BY frame_idx), '')) AS cuts_md5
       |FROM c GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** x383: cross-format dHash parity — the perceptual signature computed
    * from the GIF/LZW decode must equal the one the BMP/PPM path (x74)
    * produces, because both decode to the same pixels: one corpus, three
    * codecs, one signature. The oracle is the md5-pixel dHash derivation
    * itself. */
  def gifDhashCrossformat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    MediaSynth.dhashReal(
      MediaSynth.synthGifVideos(Tables.documents(spark, dir))).toDF()
      .select($"doc_id", $"phash")
      .orderBy("doc_id")
  }

  private val gifDhashOracle =
    MediaOracleSql.dhashCtes + s"""
       |SELECT doc_id, CAST(phash AS INTEGER) AS phash
       |FROM dh
       |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x382_gif_scene_parity",
      "scene segmentation through real GIF89a/LZW decode: x75's pipeline over compressed payloads, same pixel oracle (X7)",
      gifSceneParity, Some(gifSceneOracle)),
    QueryDef("x383_gif_dhash_crossformat",
      "cross-format perceptual-hash parity: GIF/LZW decode yields the same dHash as the BMP/PPM path (X7)",
      gifDhashCrossformat, Some(gifDhashOracle)))
}
