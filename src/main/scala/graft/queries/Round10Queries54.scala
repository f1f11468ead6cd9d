package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Round-10 fifty-fourth tier: timer-driven sessionization parity
  * (x231) — the event-time TIMER surface of `transformWithState`
  * (x207 covered ValueState; this is `handleExpiredTimer`), graded
  * against a batch oracle. */
object Round10Queries54 {

  /** Session gap (seconds) and watermark delay (seconds). */
  private val GapSec = 1800L
  private val DelaySec = 7L

  /** Micro-batch slice cuts (seconds) — the x207 chronology. */
  private val SliceCuts = Seq(1704800000L, 1705800000L)

  /** x231: timer parity — user sessions (30-min gap) maintained by
    * [[graft.streaming.IncrementalStream.TwsTimerSessionProcessor]]:
    * every session is held in ListState and flushes ONLY from
    * `handleExpiredTimer` once the event-time watermark passes
    * end+gap (AvailableNow runs a final watermark-only batch, so
    * every timer with expiry under max(ts)−delay fires before the
    * query drains). The emitted set is therefore exactly the batch
    * sessions whose expiry the final watermark passed — the pure
    * watermark-semantics rule the r12 rework adopted after ADVICE
    * caught eager end-of-batch emission fragmenting sessions that a
    * later in-watermark event would have extended.
    *
    * Scale: state is the per-user list of unexpired sessions (≥1 per
    * gap of inactivity inside the watermark delay, so small) plus
    * their timers; timers live in the same RocksDB store, partitioned
    * with the keys. */
  def twsTimerParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x231").toString
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
      .select($"user_id", $"sec",
        $"sec".cast("timestamp").as("ts"))
      .localCheckpoint(true) // r16: one scan for all staged slices
    val bounds = (Long.MinValue +: SliceCuts) zip (SliceCuts :+ Long.MaxValue)
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      ev.filter($"sec" >= lo && $"sec" < hi)
        .coalesce(1).write.parquet(s"$base/src/s$i")
      val part = new java.io.File(s"$base/src/s$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.FileSystems.getDefault
        .getPath(s"$base/src/f$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("sec", LongType), StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .withWatermark("ts", s"$DelaySec seconds")
      .as[(Long, Long, java.sql.Timestamp)]
    val sessions = graft.streaming.IncrementalStream
      .twsTimerSessions(stream, GapSec)
    // Executor-side parquet staging + temp-tree cleanup (r10 verdict #2).
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, sessions.toDF(), base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy($"user_id", $"start_sec")
  }

  private val twsTimerParityOracle =
    s"""WITH e AS MATERIALIZED (
       |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
       |  FROM events),
       |wm AS (SELECT max(sec) - $DelaySec AS wmf FROM e),
       |marked AS (
       |  SELECT user_id, sec,
       |         CASE WHEN lag(sec) OVER w IS NULL
       |                OR sec - lag(sec) OVER w > $GapSec THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
       |grp AS (
       |  SELECT user_id, sec,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY sec
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS sid
       |  FROM marked),
       |sess AS (
       |  SELECT user_id, CAST(min(sec) AS BIGINT) AS start_sec,
       |         CAST(max(sec) AS BIGINT) AS end_sec,
       |         CAST(count(*) AS BIGINT) AS n_events
       |  FROM grp GROUP BY user_id, sid)
       |SELECT user_id, start_sec, end_sec, n_events
       |FROM sess, wm
       |WHERE end_sec + $GapSec < wmf
       |ORDER BY user_id, start_sec""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x231_tws_timer_parity",
      "handleExpiredTimer parity: timer-flushed sessions over 3 real micro-batches equal batch sessions minus unflushed last-opens",
      twsTimerParity, Some(twsTimerParityOracle),
      // r15 verdict #5: TwsTimerSessionProcessor (ListState sessions,
      // timer-only emission, constant gap) is the fixed-gap special case
      // of the still-timed x362_tws_dyngap_timer's
      // TwsDynTimerSessionProcessor (same ListState layout + timer
      // contract, per-event dynamic gap) — Verify-gated, not re-timed.
      benchSkip = true))
}
