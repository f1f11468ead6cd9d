package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 wave 2: dynamic-gap sessions through the TIMER-HELD custom
  * state machine (r13 verdict "Next round #8") — x323 proved the built-in
  * `session_window(ts, CASE …)` append contract; this proves
  * [[graft.streaming.IncrementalStream.TwsDynTimerSessionProcessor]]
  * (ListState + event-time timers, the same audited contract as the
  * fixed-gap x231 processor) produces the identical emitted set. */
object Round14Queries2 {

  private val SliceCuts = Seq(1704800000L, 1705800000L)
  private val DelaySec = 7L
  private val GapPurchase = 1800L
  private val GapOther = 600L
  private val ApUsers = 60L

  /** x362: append-mode dynamic-gap session parity through the custom
    * timer-held processor — every event carries its own gap
    * (purchase 1800s, else 600s), all of a user's unexpired sessions ride
    * in ListState, merge-at-touch on the running max of window ends, and
    * a session is emitted exactly once, from its event-time timer, when
    * the watermark strictly passes its dynamic end. Same oracle shape as
    * x323 (running-max-of-ends sessionization, `end < final watermark`),
    * different engine mechanism — the two gap families now share one
    * state contract. Scale: state is the per-user unexpired session list
    * (bounded by the watermark delay); one user_id shuffle per batch. */
  def twsDynGapTimerParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x362").toString
    val ev = Tables.events(spark, dir).filter($"user_id" < ApUsers)
      .select($"user_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        when($"event_type" === "purchase", lit(GapPurchase))
          .otherwise(lit(GapOther)).cast("long").as("gap"))
      .select($"user_id", $"sec", $"gap", $"sec".cast("timestamp").as("ts"))
      .localCheckpoint(true) // r16: one scan for all staged slices
    val bounds = (Long.MinValue +: SliceCuts) zip (SliceCuts :+ Long.MaxValue)
    QueryUtil.stageFrames(bounds.map { case (lo, hi) =>
      ev.filter($"sec" >= lo && $"sec" < hi)
    }, s"$base/src")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("sec", LongType), StructField("gap", LongType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .withWatermark("ts", s"$DelaySec seconds")
      .as[(Long, Long, Long, java.sql.Timestamp)]
    val sessions = graft.streaming.IncrementalStream.twsDynTimerSessions(stream)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, sessions.toDF(), base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy($"user_id", $"start_sec")
  }

  private val twsDynGapTimerOracle =
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

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x362_tws_dyngap_timer",
      "dynamic-gap sessions via the timer-held custom processor: ListState merge-at-touch, strict end < wm emission, x323-shape oracle",
      twsDynGapTimerParity, Some(twsDynGapTimerOracle)))
}
