package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 second tier: preference-data fitting (Bradley–Terry, the
  * pairwise-comparison strength model behind RLHF reward-data QA) and
  * the stream-stream OUTER join parity (the unmatched-emission contract
  * x138's inner join can't exercise). */
object Round11Queries2 {

  /** Unrolled MM iterations (Hunter 2004). */
  private val BtIters = 8

  /** x241: Bradley–Terry preference strengths — fit p_i for each event
    * type from per-user pairwise comparisons (type i beats type j for a
    * user when the user has strictly more i-events; ties drop). The MM
    * update p_i ← W_i / Σ_j n_ij/(p_i+p_j) runs [[BtIters]] unrolled
    * rounds with every per-j term quantized to fixed point BEFORE its
    * sum (integer sums are order-free, so Spark's partitioned aggregate
    * equals DuckDB's sequential one exactly — the x35 trained-aggregate
    * recipe); the two remaining double ops per round (the W/den ratio
    * and the normalization) are single IEEE expressions spelled
    * identically in both engines. Published: rank, strength (1e-9 fixed
    * point, Σ≈1), wins, games per item.
    *
    * Scale: the comparison build is one corpus-scale self-join keyed by
    * user (co-partitioned, never all-pairs across users); everything
    * after lives on K items / K² pairs — at preference-data scale K is
    * #models or #response-variants, thousands at most, so the MM rounds
    * are driver-free joins over broadcast-size frames. */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val uc = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
    val cmp = uc.toDF("u", "i", "ca")
      .join(uc.toDF("u", "j", "cb"), "u")
      .filter($"i" < $"j" && $"ca" =!= $"cb")
      .select($"i", $"j", ($"ca" > $"cb").cast("long").as("win_i"))
    val pa = cmp.groupBy($"i", $"j")
      .agg(count(lit(1)).as("n"), sum($"win_i").as("w_i"))
      .localCheckpoint(true)
    val nd = pa.select($"i", $"j", $"n")
      .unionByName(pa.select($"j".as("i"), $"i".as("j"), $"n"))
      .localCheckpoint(true)
    val wins = pa.select($"i", $"w_i".as("w"))
      .unionByName(pa.select($"j".as("i"), ($"n" - $"w_i").as("w")))
      .groupBy($"i").agg(sum($"w").as("w"))
      .localCheckpoint(true)
    val kf = wins.agg(count(lit(1)).as("k"))
    val p0 = wins.crossJoin(broadcast(kf))
      .select($"i", expr("CAST(floor(1e9 / k + 0.5) AS BIGINT)").as("p"))
    val pN = (1 to BtIters).foldLeft(p0) { (p, _) =>
      val pc = p.localCheckpoint(true)
      val den = nd
        .join(pc.select($"i", $"p".as("pi_")), "i")
        .join(pc.select($"i".as("j"), $"p".as("pj_")), "j")
        .select($"i", expr(
          "CAST(floor(CAST(n AS DOUBLE) * 1e18 / (pi_ + pj_) + 0.5) AS BIGINT)")
          .as("term"))
        .groupBy($"i").agg(sum($"term").as("den_fp"))
      val praw = den.join(wins, "i")
        .select($"i", expr(
          "CAST(floor(CAST(w AS DOUBLE) * 1e9 / CAST(den_fp AS DOUBLE) * 1e9 + 0.5) AS BIGINT)")
          .as("praw_fp"))
      praw.crossJoin(broadcast(
          praw.agg(sum($"praw_fp").cast("double").as("tot"))))
        .select($"i", expr(
          "CAST(floor(CAST(praw_fp AS DOUBLE) * 1e9 / tot + 0.5) AS BIGINT)")
          .as("p"))
    }
    val games = nd.groupBy($"i").agg(sum($"n").as("games"))
    pN.join(wins, "i").join(games, "i")
      .withColumn("rk", row_number().over(
        Window.orderBy($"p".desc, $"i")).cast("long"))
      .select($"rk", $"i".as("item"), $"p".as("bt_fp9"), $"w".as("wins"),
        $"games")
      .orderBy("rk")
  }

  private def btRoundSql(r: Int): String = {
    val prev = s"p${r - 1}"
    s"""d$r AS (
       |  SELECT nd.i,
       |         CAST(sum(CAST(floor(CAST(nd.n AS DOUBLE) * 1e18 / (pi.p + pj.p)
       |                + 0.5) AS BIGINT)) AS BIGINT) AS den_fp
       |  FROM nd JOIN $prev pi ON pi.i = nd.i
       |          JOIN $prev pj ON pj.i = nd.j
       |  GROUP BY nd.i),
       |u$r AS MATERIALIZED (
       |  SELECT d.i,
       |         CAST(floor(CAST(w.w AS DOUBLE) * 1e9 / CAST(d.den_fp AS DOUBLE)
       |                * 1e9 + 0.5) AS BIGINT) AS praw_fp
       |  FROM d$r d JOIN wins w ON w.i = d.i),
       |p$r AS MATERIALIZED (
       |  SELECT i, CAST(floor(CAST(praw_fp AS DOUBLE) * 1e9 / t.tot + 0.5)
       |              AS BIGINT) AS p
       |  FROM u$r, (SELECT CAST(sum(praw_fp) AS DOUBLE) AS tot FROM u$r) t)"""
      .stripMargin
  }

  private val bradleyTerryOracle = {
    val rounds = (1 to BtIters).map(btRoundSql).mkString(",\n")
    s"""WITH uc AS (
       |  SELECT user_id, event_type, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |cmp AS (
       |  SELECT a.event_type AS i, b.event_type AS j,
       |         CASE WHEN a.c > b.c THEN 1 ELSE 0 END AS win_i
       |  FROM uc a JOIN uc b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  WHERE a.c <> b.c),
       |pa AS MATERIALIZED (
       |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(win_i) AS BIGINT) AS w_i
       |  FROM cmp GROUP BY 1, 2),
       |nd AS MATERIALIZED (
       |  SELECT i, j, n FROM pa UNION ALL SELECT j AS i, i AS j, n FROM pa),
       |wins AS MATERIALIZED (
       |  SELECT i, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT i, w_i AS w FROM pa
       |    UNION ALL SELECT j AS i, n - w_i AS w FROM pa) z
       |  GROUP BY i),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM wins),
       |p0 AS MATERIALIZED (
       |  SELECT i, CAST(floor(1e9 / k + 0.5) AS BIGINT) AS p FROM wins, kk),
       |$rounds,
       |games AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM nd GROUP BY i)
       |SELECT CAST(row_number() OVER (ORDER BY p.p DESC, p.i) AS BIGINT) AS rk,
       |       p.i AS item, p.p AS bt_fp9, w.w AS wins, g.games
       |FROM p$BtIters p JOIN wins w ON w.i = p.i JOIN games g ON g.i = p.i
       |ORDER BY rk""".stripMargin
  }

  /** Attribution window (seconds) and the heartbeat that flushes every
    * unmatched view out of the outer join's state. */
  private val OuterWindowSec = 21600L
  private val OuterUsers = 60

  /** x242: stream-stream LEFT OUTER join parity — the unmatched-emission
    * contract: views LEFT-join clicks of the same user within the
    * following [[OuterWindowSec]]; a view with no click in-window must
    * be emitted EXACTLY ONCE with a null click once the watermark passes
    * its eviction point (inner-join x138 never exercises eviction
    * output). Both sides replay as chronological file slices; a
    * far-future heartbeat on EACH side (distinct sentinel users, so the
    * two heartbeats cannot match each other) advances the min-of-inputs
    * watermark past every real view, flushing all unmatched state —
    * x152's sentinel recipe applied to join state. The appended
    * emissions must equal the batch LEFT interval join, nulls coalesced
    * to −1 on both sides for hash-stable compare.
    *
    * Scale: outer-join state is the same keyed watermark-bounded buffer
    * as the inner join, plus the eviction emission; arrival in
    * event-time order keeps evictions exact and exactly-once. */
  def streamOuterJoinParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x242").toString
    // r16: snapshot once — the view/click slice stack used to re-scan
    // events per staged file (2 sides × 3 slices)
    val ev = Tables.events(spark, dir).filter($"user_id" < OuterUsers)
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts"),
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
      .localCheckpoint(true)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("view_user"), $"event_id".as("view_id"),
        $"ts".as("view_ts"), $"sec")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("click_user"), $"event_id".as("click_id"),
        $"ts".as("click_ts"), $"sec")
    // TWO trailing heartbeats per side: the join applies the PREVIOUS
    // batch's watermark, so the first heartbeat batch advances the
    // watermark and the second gives the join a batch that runs UNDER
    // it, flushing the last unmatched views (measured: with one
    // heartbeat the final no-data batch still left the newest ~4
    // unmatched views unflushed).
    def heartbeat(userCol: String, idCol: String, tsCol: String, day: Int) =
      spark.range(1).select(lit(-1L - (if (userCol == "view_user") 0 else 1))
          .as(userCol), lit(-1L * day).as(idCol),
        expr(s"TIMESTAMP_NTZ'2024-03-0$day 00:00:30'").as(tsCol),
        lit(Long.MaxValue).as("sec"))
    val cuts = Seq(1704800000L, 1705800000L)
    def slices(df: DataFrame, hbs: Seq[DataFrame]): Seq[DataFrame] = {
      val bounds = (Long.MinValue +: cuts) zip (cuts :+ Long.MaxValue)
      bounds.map { case (lo, hi) =>
        df.filter($"sec" >= lo && $"sec" < hi && $"sec" =!= Long.MaxValue)
      } ++ hbs
    }
    QueryUtil.stageFrames(
      slices(views, Seq(1, 2).map(heartbeat("view_user", "view_id", "view_ts", _)))
        .map(_.drop("sec")), s"$base/v")
    QueryUtil.stageFrames(
      slices(clicks, Seq(1, 2).map(heartbeat("click_user", "click_id", "click_ts", _)))
        .map(_.drop("sec")), s"$base/c")
    val vSchema = views.drop("sec").schema
    val cSchema = clicks.drop("sec").schema
    val vStream = spark.readStream.schema(vSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/v")
      .withWatermark("view_ts", "1 hour")
    val cStream = spark.readStream.schema(cSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/c")
      .withWatermark("click_ts", "1 hour")
    // NOTE: the heartbeat rows must NOT be filtered inside the streaming
    // plan — a `view_user >= 0` filter here gets pushed below the
    // watermark operator into the scan, and the join's equality
    // constraint propagates it to the CLICK scan too, so neither
    // heartbeat ever reaches the watermark tracker and the last
    // unmatched views never flush (measured r11: watermark stuck at the
    // real data's max). The sentinels are dropped AFTER the staged
    // read-back instead.
    val joined = vStream.join(cStream,
      expr(s"""click_user = view_user
              |AND click_ts >= view_ts
              |AND click_ts <= view_ts + INTERVAL $OuterWindowSec SECONDS"""
        .stripMargin),
      "leftOuter")
      .select($"view_user".as("user_id"), $"view_id",
        coalesce($"click_id", lit(-1L)).as("click_id"),
        coalesce(unix_timestamp($"click_ts".cast("timestamp"))
          - unix_timestamp($"view_ts".cast("timestamp")), lit(-1L))
          .as("delta_s"))
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, joined, base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.filter($"user_id" >= 0) // the heartbeats' own emissions
      .orderBy("view_id", "click_id")
  }

  private val streamOuterJoinParityOracle =
    s"""WITH v AS (SELECT user_id, event_id AS view_id,
       |                  date_trunc('second', ts) AS vts
       |           FROM events WHERE event_type = 'view' AND user_id < $OuterUsers),
       |c AS (SELECT user_id, event_id AS click_id,
       |             date_trunc('second', ts) AS cts
       |      FROM events WHERE event_type = 'click' AND user_id < $OuterUsers)
       |SELECT v.user_id, v.view_id,
       |       coalesce(c.click_id, -1) AS click_id,
       |       coalesce(CAST(epoch(c.cts) AS BIGINT) - CAST(epoch(v.vts) AS BIGINT),
       |                -1) AS delta_s
       |FROM v LEFT JOIN c ON c.user_id = v.user_id
       |              AND c.cts >= v.vts
       |              AND c.cts <= v.vts + INTERVAL $OuterWindowSec SECONDS
       |ORDER BY view_id, click_id""".stripMargin

  /** x243 cohort bound + slice cuts (x239's convention). */
  private val ChainUsers = 40
  private val ChainCuts = Seq(1704800000L, 1705800000L)
  private val ChainDupTailSec = 86400L

  /** x243: CHAINED stateful operators in one streaming job —
    * `dropDuplicatesWithinWatermark` feeding a watermarked tumbling
    * hourly aggregation, the Spark-4 multi-stateful pipeline a real
    * ingest runs as ONE job instead of dedup-job → agg-job (x239 proves
    * the dedup stage alone; x152 the window flush alone; this proves
    * their composition, including watermark propagation THROUGH the
    * dedup operator into the aggregation). Replay includes same-batch
    * and cross-batch duplicate arrivals plus a far-future heartbeat that
    * flushes every real window; emissions must equal the hourly counts
    * over the duplicate-free batch recompute. Sentinel rows are dropped
    * AFTER the staged read-back — never inside the streaming plan (the
    * x242 filter-pushdown-kills-watermark gotcha).
    *
    * Scale: both states are watermark-bounded (ids within the window;
    * open hours per user); one job means one ingest scan and one
    * checkpoint lineage for the whole dedup→aggregate path. */
  def chainedStatefulParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x243").toString
    // r16: snapshot once — the slice + same-batch-dup + cross-batch-dup
    // stack used to re-scan events per staged filter (~7 scans)
    val ev = Tables.events(spark, dir).filter($"user_id" < ChainUsers)
      .select($"event_id", $"user_id",
        date_trunc("second", $"ts").as("ts"),
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
      .localCheckpoint(true)
    val bounds = (Long.MinValue +: ChainCuts) zip (ChainCuts :+ Long.MaxValue)
    val slices = bounds.zipWithIndex.map { case ((lo, hi), i) =>
      val slice = ev.filter($"sec" >= lo && $"sec" < hi)
      val sameBatchDup =
        if (hi == Long.MaxValue) slice.limit(0)
        else slice.filter($"sec" >= hi - ChainDupTailSec)
      val crossBatchDup =
        if (i == 0) slice.limit(0)
        else ev.filter($"sec" >= lo - ChainDupTailSec && $"sec" < lo)
      slice.unionByName(sameBatchDup).unionByName(crossBatchDup)
    }
    val heartbeat = spark.range(1).select(lit(-1L).as("event_id"),
      lit(-1L).as("user_id"),
      expr("TIMESTAMP_NTZ'2024-03-01 00:00:30'").as("ts"),
      lit(Long.MaxValue).as("sec"))
    QueryUtil.stageFrames((slices :+ heartbeat).map(_.drop("sec")), s"$base/src")
    val agg = spark.readStream.schema(ev.drop("sec").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy($"user_id", window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"window.start".as("hour_start"), $"n")
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, agg, base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.filter($"user_id" >= 0) // the heartbeat's own (unflushed-anyway) key
      .orderBy("user_id", "hour_start")
  }

  private val chainedStatefulParityOracle =
    s"""WITH d AS (
       |  SELECT DISTINCT event_id, user_id, date_trunc('second', ts) AS ts
       |  FROM events WHERE user_id < $ChainUsers)
       |SELECT user_id, date_trunc('hour', ts) AS hour_start,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM d
       |GROUP BY 1, 2
       |ORDER BY user_id, hour_start""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x243_chained_stateful_parity",
      "chained stateful streaming: dropDuplicatesWithinWatermark -> watermarked hourly aggregation in ONE job, real duplicate arrivals + heartbeat flush == dup-free batch recompute",
      chainedStatefulParity, Some(chainedStatefulParityOracle)),
    QueryDef("x241_bradley_terry",
      "Bradley-Terry preference strengths from per-user pairwise comparisons: 8 unrolled MM rounds, per-term fixed-point quantization, rank/strength/wins panel",
      bradleyTerry, Some(bradleyTerryOracle)),
    QueryDef("x242_stream_outer_join_parity",
      "watermarked stream-stream LEFT OUTER join parity: heartbeat-flushed unmatched views emitted exactly once with nulls == batch left interval join",
      streamOuterJoinParity, Some(streamOuterJoinParityOracle)))
}
