package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 fourth tier: Cliff's delta (the ordinal effect size that
  * completes x270's Mann–Whitney "is it shifted?" with "by how much, in
  * rank terms"), and the APPEND-mode dynamic-gap session parity — x319
  * pinned cross-batch dynamic-window MERGE under complete mode; this
  * pins the production emission contract (watermark-gated finalization).
  */
object Round13Queries4 {

  /** Shared en-vs-rest n_chars value census: (v, ta = en count,
    * tb = non-en count). One definition feeds x322 (Cliff's delta),
    * x325 (energy statistic), and x326 (Gini stump) so a fixture or
    * normalization change can never drift the paired statistics apart
    * (r13 code-review: this was copy-pasted three times). */
  private[queries] def enCharsCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"n_chars" > 0)
      .select($"n_chars".cast("long").as("v"),
        when($"lang" === "en", 1L).otherwise(0L).as("a"))
      .groupBy($"v")
      .agg(sum($"a").as("ta"), sum(lit(1L) - $"a").as("tb"))
  }

  // ---------------------------------------------------------------- x322

  /** x322: Cliff's delta between en and non-en document lengths —
    * δ = (#(a>b) − #(a<b)) / (n_a·n_b), the ordinal effect size paired
    * with x270's U test (same census, same cumulative recipe): gt/lt/tie
    * pair counts are exact BIGINTs off the n_chars census, δ is the one
    * quantized ratio, and the conventional magnitude band (Romano et
    * al. thresholds 0.147/0.33/0.474) is decided by CROSS-MULTIPLIED
    * integer predicates — |num|·1000 vs den·147 etc. — so the label
    * never rides a double.
    *
    * Scale: identical to x270 — one census groupBy, one cumulative
    * window over ≤|distinct lengths| rows, one scalar projection. */
  def cliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = enCharsCensus(spark, dir)
    val w = Window.orderBy($"v").rowsBetween(Long.MinValue, -1)
    val ranked = census
      .withColumn("cumb", coalesce(sum($"tb").over(w), lit(0L)))
    val agg = ranked.agg(
      sum($"ta").as("na"), sum($"tb").as("nb"),
      sum($"ta" * $"cumb").as("gt"),
      sum($"ta" * $"tb").as("ties"))
    agg.select($"na", $"nb", $"gt",
      ($"na" * $"nb" - $"gt" - $"ties").as("lt"), $"ties")
      .withColumn("num", $"gt" - $"lt")
      .withColumn("den", $"na" * $"nb")
      .select($"na", $"nb", $"gt", $"lt", $"ties",
        QueryUtil.halfUp($"num".cast("double") / $"den".cast("double"), 6)
          .as("delta"),
        when(abs($"num") * 1000L < $"den" * 147L, "negligible")
          .when(abs($"num") * 1000L < $"den" * 330L, "small")
          .when(abs($"num") * 1000L < $"den" * 474L, "medium")
          .otherwise("large").as("band"))
  }

  private val cliffsDeltaOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(n_chars AS BIGINT) AS v,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS tb
      |  FROM documents WHERE n_chars > 0 GROUP BY 1),
      |ranked AS (
      |  SELECT *, COALESCE(sum(tb) OVER (ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM census),
      |agg AS (
      |  SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb,
      |         CAST(sum(ta * cumb) AS BIGINT) AS gt,
      |         CAST(sum(ta * tb) AS BIGINT) AS ties
      |  FROM ranked),
      |d AS (
      |  SELECT na, nb, gt, na * nb - gt - ties AS lt, ties,
      |         gt - (na * nb - gt - ties) AS num, na * nb AS den
      |  FROM agg)
      |SELECT na, nb, gt, lt, ties,
      |       floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000 + 0.5)
      |         / 1000000.0 AS delta,
      |       CASE WHEN abs(num) * 1000 < den * 147 THEN 'negligible'
      |            WHEN abs(num) * 1000 < den * 330 THEN 'small'
      |            WHEN abs(num) * 1000 < den * 474 THEN 'medium'
      |            ELSE 'large' END AS band
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- x323

  /** Micro-batch slice cuts (seconds) — the x231 chronology — and the
    * watermark delay. */
  private val SliceCuts = Seq(1704800000L, 1705800000L)
  private val DelaySec = 7L
  private val GapPurchase = 1800L
  private val GapOther = 600L
  /** Streaming-cohort bound (state size of the parity run). */
  private val ApUsers = 40L

  /** x323: APPEND-mode dynamic-gap session parity — the production
    * emission contract x319's complete-mode harness deliberately
    * sidesteps: the same `session_window(ts, CASE …)` aggregation runs
    * over 3 chronological micro-batches WITH a watermark, so a session
    * is emitted exactly once, when the event-time watermark passes its
    * (dynamic) window end — and never again, even though later batches
    * keep adding sessions for the same user. AvailableNow's final
    * watermark-only batch flushes everything under max(ts) − delay; the
    * oracle recomputes batch dynamic sessionization and keeps sessions
    * with end < final watermark (strict — the same boundary x231
    * pinned for timer expiry).
    *
    * Scale: watermark-bounded session state (the production deployment
    * shape); one shuffle on user_id per micro-batch. */
  def streamDynGapAppend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x323").toString
    val ev = Tables.events(spark, dir).filter($"user_id" < ApUsers)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"event_type",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
    val bounds = (Long.MinValue +: SliceCuts) zip (SliceCuts :+ Long.MaxValue)
    // r16: snapshot once — slices filter the checkpoint, not a re-scan
    val snap = ev.localCheckpoint(true)
    QueryUtil.stageFrames(bounds.map { case (lo, hi) =>
      snap.filter($"sec" >= lo && $"sec" < hi).drop("sec")
    }, s"$base/src")
    val stream = spark.readStream.schema(ev.drop("sec").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .withWatermark("ts", s"$DelaySec seconds")
    val gap = when(col("event_type") === "purchase",
      lit(s"$GapPurchase seconds")).otherwise(lit(s"$GapOther seconds"))
    val sessions = stream
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("CAST(unix_timestamp(session_window.start) AS BIGINT)").as("start_sec"),
        expr("CAST(unix_timestamp(session_window.end) AS BIGINT)").as("end_sec"),
        col("n_events"))
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, sessions, base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy($"user_id", $"start_sec")
  }

  private val streamDynGapAppendOracle =
    s"""WITH e AS MATERIALIZED (
       |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         CAST(max(CASE WHEN event_type = 'purchase'
       |                       THEN $GapPurchase ELSE $GapOther END) AS BIGINT) AS gap
       |  FROM events WHERE user_id < $ApUsers GROUP BY 1, 2),
       |wm AS (SELECT max(sec) - $DelaySec AS wmf FROM e),
       |runs AS (
       |  SELECT user_id, sec, cnt, sec + gap AS endv,
       |         max(sec + gap) OVER (PARTITION BY user_id ORDER BY sec
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM e),
       |brk AS (
       |  SELECT *, CASE WHEN prev_max IS NULL OR sec > prev_max
       |                 THEN 1 ELSE 0 END AS b
       |  FROM runs),
       |sid AS (
       |  SELECT *, sum(b) OVER (PARTITION BY user_id ORDER BY sec
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
       |  FROM brk),
       |sess AS (
       |  SELECT user_id, CAST(min(sec) AS BIGINT) AS start_sec,
       |         CAST(max(endv) AS BIGINT) AS end_sec,
       |         CAST(sum(cnt) AS BIGINT) AS n_events
       |  FROM sid GROUP BY user_id, s)
       |SELECT user_id, start_sec, end_sec, n_events
       |FROM sess, wm
       |WHERE end_sec < wmf
       |ORDER BY user_id, start_sec""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x322_cliffs_delta",
      "Cliff's delta effect size between en/non-en doc lengths: exact census pair counts, cross-multiplied magnitude band",
      cliffsDelta, Some(cliffsDeltaOracle)),
    QueryDef("x323_stream_dyngap_append",
      "append-mode dynamic-gap session parity over 3 real micro-batches: watermark-gated emission, strict end < wm boundary",
      streamDynGapAppend, Some(streamDynGapAppendOracle)))
}
