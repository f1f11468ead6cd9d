package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 11: PNG/DEFLATE joins the codec family, and the
  * universal mixed-format reader — four codecs, one pixel oracle. */
object Round14Queries11 {

  /** x384: scene segmentation through PNG/DEFLATE — x75's pipeline over
    * per-frame PNG payloads: zlib inflate + CRC-verified chunk walk +
    * the full five-filter reconstruction (the encoder cycles the filter
    * per row, so Sub/Up/Average/Paeth all sit in the oracle path, not
    * just filter None). Same pixel oracle as x75/x382 — what's new under
    * test is DEFLATE and the filter suite. */
  def pngSceneParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = MediaSynth.decodeFrameStats(
      MediaSynth.synthPngVideos(Tables.documents(spark, dir))).toDF()
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

  // pixel content is a function of text only, so the PNG container reuses
  // the exact x75/x382 oracle — the codec is the variable under test
  private val pngSceneOracle =
    ConnectorQueries.sceneCtes + s"""
       |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames,
       |       CAST(1 + coalesce(sum(cut), 0) AS INTEGER) AS n_scenes,
       |       md5(coalesce(string_agg(CASE WHEN cut = 1 THEN CAST(frame_idx AS VARCHAR) END, ',' ORDER BY frame_idx), '')) AS cuts_md5
       |FROM c GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** x385: the universal reader census — one corpus whose container
    * format cycles doc_id % 4 (BMP / PPM / animated GIF / concatenated
    * PNGs), decoded by ONE magic-dispatch reader into identical pixels:
    * per-doc format, frame count, geometry, total luma. The lake-intake
    * reality check: four codecs, one oracle. */
  def mixedFormatCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = MediaSynth.decodeFrameStats(
      MediaSynth.synthMixedVideos(Tables.documents(spark, dir))).toDF()
    frames.groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_frames"),
        max($"width").as("width"), max($"height").as("height"),
        sum($"s0" + $"s1" + $"s2" + $"s3").as("luma_sum"))
      .select($"doc_id",
        element_at(array(lit("bmp"), lit("ppm"), lit("gif"), lit("png")),
          ($"doc_id" % 4 + 1).cast("int")).as("fmt"),
        $"n_frames", $"width", $"height", $"luma_sum")
      .orderBy("doc_id")
  }

  private val mixedFormatOracle =
    MediaOracleSql.pixelCtes + s""",
       |tot AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS luma_sum FROM lm GROUP BY doc_id)
       |SELECT s.doc_id,
       |       ['bmp', 'ppm', 'gif', 'png'][CAST(s.doc_id % 4 + 1 AS INTEGER)] AS fmt,
       |       CAST(s.nf AS INTEGER) AS n_frames,
       |       CAST(s.w AS INTEGER) AS width, CAST(s.h AS INTEGER) AS height,
       |       t.luma_sum
       |FROM s JOIN tot t ON t.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x384_png_scene_parity",
      "scene segmentation through PNG: zlib inflate, CRC-verified chunks, all five filter reconstructions, same pixel oracle (X7)",
      pngSceneParity, Some(pngSceneOracle)),
    QueryDef("x385_mixed_format_census",
      "universal reader census: BMP/PPM/GIF/PNG containers by doc_id % 4, one magic-dispatch decode, one pixel oracle (X7)",
      mixedFormatCensus, Some(mixedFormatOracle)))
}
