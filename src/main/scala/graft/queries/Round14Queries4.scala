package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.MediaSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 4: media ANALYTICS over the real decode — the operations
  * a multimodal curation pipeline runs once frames are actually parsed:
  * near-dup clustering of the x74 pHash pairs (x364), per-channel color
  * profiles (x365 — channel-exact, so an RGB/BGR defect that luma audits
  * can cancel still fails), and per-video motion profiling from frame
  * deltas (x366). All integer-exact, all pixels oracle-rederived from the
  * md5 formulas while Spark goes through real encoded bytes. */
object Round14Queries4 {

  /** x364: pHash near-dup CLUSTERS — connected components over the real-
    * decode dHash pair set (x74), the media twin of x14's text clusters:
    * cluster id = min doc_id reachable, canonical = the cluster's keeper.
    * Scale: pairs come from the banded Hamming join (never all-pairs);
    * components converge in O(log diameter) star rounds. */
  def phashClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = ConnectorQueries.phashNearDup(spark, dir).select($"a", $"b")
    val nodes = Tables.documents(spark, dir).select($"doc_id")
    graft.operators.Components.connectedComponentsStars(spark, nodes, pairs, "doc_id")
      .select($"doc_id", $"component".as("cluster_id"),
        ($"doc_id" === $"component").cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  private val phashClustersOracle =
    MediaOracleSql.dhashCtesWith("WITH RECURSIVE") + s""",
       |bd0 AS (SELECT doc_id, phash, unnest(range(0, 3)) AS j FROM dh),
       |bd AS (SELECT doc_id, phash, j, (phash >> CAST(5 * j AS INTEGER)) & 31 AS bv FROM bd0),
       |pruned AS (SELECT doc_id, phash, j, bv
       |           FROM (SELECT *, count(*) OVER (PARTITION BY j, bv) AS bn FROM bd)
       |           WHERE bn <= ${graft.operators.Dedup.DefaultMaxBucket}),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.phash AS pa, y.phash AS pb
       |         FROM pruned x JOIN pruned y ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id),
       |pairs2 AS (SELECT a, b FROM cand WHERE bit_count(xor(pa, pb)) <= 1),
       |edges AS (SELECT a AS src, b AS dst FROM pairs2
       |          UNION ALL SELECT b AS src, a AS dst FROM pairs2),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT e.src AS id, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.id),
       |labeled AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
       |              CAST(min(r) = id AS INTEGER) AS is_canonical
       |            FROM reach GROUP BY id)
       |SELECT doc_id, cluster_id, is_canonical
       |FROM labeled
       |ORDER BY doc_id""".stripMargin

  /** Histogram bins for x365 (bin = value * 4 / 256 = value // 64). */
  private val HistBins = 4

  /** x365: per-channel color profile over every decoded frame's pixels —
    * the corpus-QA view a vision-data pipeline runs (dominant-channel
    * skew, clipped-range detection). Emitted per (doc, channel, bin) with
    * exact integer counts; the full decode → histogram pass is one narrow
    * flatMap, shuffled only by the driver-facing ORDER BY. */
  def channelHist(spark: SparkSession, dir: String): DataFrame = {
    MediaSynth.decodeChannelHist(
      MediaSynth.synthVideos(Tables.documents(spark, dir)), HistBins)
      .toDF().orderBy("doc_id", "channel", "bin")
  }

  private val channelHistOracle =
    MediaOracleSql.pixelCtes + s""",
       |u AS (SELECT doc_id,
       |        unnest([{'channel': 'r', 'v': r}, {'channel': 'g', 'v': g},
       |                {'channel': 'b', 'v': b}]) AS cv
       |      FROM px),
       |grid AS (SELECT doc_id, channel, bin
       |         FROM (SELECT DISTINCT doc_id FROM documents)
       |         CROSS JOIN (SELECT unnest(['r', 'g', 'b']) AS channel)
       |         CROSS JOIN (SELECT unnest(range(0, $HistBins)) AS bin)),
       |h AS (SELECT doc_id, cv.channel AS channel,
       |        CAST(cv.v * $HistBins // 256 AS INTEGER) AS bin,
       |        CAST(count(*) AS BIGINT) AS n
       |      FROM u GROUP BY 1, 2, 3)
       |SELECT g.doc_id, g.channel, CAST(g.bin AS INTEGER) AS bin,
       |       coalesce(h.n, 0) AS n
       |FROM grid g LEFT JOIN h ON h.doc_id = g.doc_id
       |  AND h.channel = g.channel AND h.bin = g.bin
       |ORDER BY g.doc_id, g.channel, g.bin""".stripMargin

  /** x366: motion profile — per-video total and peak frame-to-frame
    * change, the shot-activity statistic a frame sampler budgets by:
    * dist(i) = L1 distance of quadrant luma sums to the previous frame
    * (x75's cut signal), aggregated exactly (BIGINTs). Single-frame
    * videos profile as zero motion. */
  def motionProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = MediaSynth.decodeFrameStats(
      MediaSynth.synthVideos(Tables.documents(spark, dir))).toDF()
    val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
    val dist = abs($"s0" - lag($"s0", 1).over(w)) + abs($"s1" - lag($"s1", 1).over(w)) +
      abs($"s2" - lag($"s2", 1).over(w)) + abs($"s3" - lag($"s3", 1).over(w))
    frames.withColumn("dist", dist)
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_frames"),
        coalesce(sum($"dist"), lit(0L)).as("total_motion"),
        coalesce(max($"dist"), lit(0L)).as("max_step"))
      .orderBy("doc_id")
  }

  private val motionProfileOracle =
    MediaOracleSql.frameQuadCtes + s""",
       |d AS (SELECT doc_id, frame_idx,
       |        abs(s0 - lag(s0) OVER w) + abs(s1 - lag(s1) OVER w)
       |        + abs(s2 - lag(s2) OVER w) + abs(s3 - lag(s3) OVER w) AS dist
       |      FROM fq
       |      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
       |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames,
       |       CAST(coalesce(sum(dist), 0) AS BIGINT) AS total_motion,
       |       CAST(coalesce(max(dist), 0) AS BIGINT) AS max_step
       |FROM d GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x364_phash_clusters",
      "connected-component media near-dup clusters over real-decode dHash pairs (X7+X2)",
      phashClusters, Some(phashClustersOracle)),
    QueryDef("x365_channel_hist",
      "per-channel color histograms over all decoded frames: channel-exact RGB audit + corpus color QA (X7)",
      channelHist, Some(channelHistOracle)),
    QueryDef("x366_motion_profile",
      "per-video motion profile from decoded frame deltas: total + peak L1 quadrant change (X7)",
      motionProfile, Some(motionProfileOracle)))
}
