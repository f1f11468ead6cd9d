package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 third tier: Holt's linear-trend smoothing as an exact
  * fixed-point integer recurrence (typed per-key fold vs recursive-CTE
  * oracle), dynamic-gap session windows (batch engine surface + the
  * streaming cross-batch-merge parity), fill-in-the-middle span
  * splitting (the code-model data transform), and the `try_` arithmetic
  * semantics pin.
  */
object Round13Queries3 {

  // ---------------------------------------------------------------- x317

  /** Per-type daily revenue census shared by the Holt fold and its
    * oracle: (event_type, epoch-day, cents). */
  private[queries] def dailyCents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"day").agg(sum($"cents").as("cents"))
  }

  /** x317: Holt's linear-trend exponential smoothing (α = β = ½) over
    * each event type's daily revenue, as an EXACT integer recurrence:
    * l_t = (x_t + l_{t−1} + b_{t−1}) quot 2, b_t = (l_t − l_{t−1} +
    * b_{t−1}) quot 2 with TRUNCATING division as the pinned rounding
    * convention — JVM `/` and DuckDB `//` both truncate toward zero
    * (measured: −7 // 2 = −3 in DuckDB, NOT floor), so negative trend
    * states stay bit-identical; Math.floorDiv would diverge from the
    * oracle on every negative state. Init l₁ = x₁, b₁ = 0. A
    * sequential per-key recurrence is
    * the one shape SQL can't fold distributively, so the engine side is
    * a typed groupByKey.mapGroups over the (tiny) per-key day series
    * and the oracle is a recursive CTE stepping i → i+1 — the x303
    * sequential-state template.
    *
    * Scale: the fold's working set is one key's DAY CENSUS (bounded by
    * the time span, not the event count); the full-data pass is the
    * map-side-combinable daily groupBy. Forecast = l + 7·b (7-day
    * horizon), still integer. */
  def holtLinear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyCents(spark, dir).as[(String, Long, Long)]
    daily.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val xs = it.toArray.sortBy(_._2).map(_._3)
        var l = xs.head
        var b = 0L
        xs.tail.foreach { x =>
          val lPrev = l
          l = (x + l + b) / 2L
          b = (l - lPrev + b) / 2L
        }
        (k, xs.length.toLong, l, b, l + 7L * b)
      }
      .toDF("event_type", "n_days", "level", "trend", "forecast7")
      .orderBy($"event_type")
  }

  private val holtLinearOracle =
    """WITH RECURSIVE daily AS MATERIALIZED (
      |  SELECT event_type,
      |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |seq AS MATERIALIZED (
      |  SELECT event_type, cents,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
      |  FROM daily),
      |rec AS (
      |  SELECT event_type, i, cents AS l, CAST(0 AS BIGINT) AS b
      |  FROM seq WHERE i = 1
      |  UNION ALL
      |  SELECT s.event_type, s.i,
      |         (s.cents + r.l + r.b) // 2 AS l,
      |         (((s.cents + r.l + r.b) // 2) - r.l + r.b) // 2 AS b
      |  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1),
      |n AS (SELECT event_type, max(i) AS nn FROM seq GROUP BY 1)
      |SELECT r.event_type, n.nn AS n_days, r.l AS level, r.b AS trend,
      |       r.l + 7 * r.b AS forecast7
      |FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.nn
      |ORDER BY r.event_type""".stripMargin

  // ---------------------------------------------------------------- x318

  /** Dynamic session gaps: purchases keep a session alive for 30
    * minutes, everything else for 10. */
  private val GapPurchase = 1800L
  private val GapOther = 600L

  /** The shared session aggregation (batch and streaming run the SAME
    * plan — x318 executes it directly, x319 over a file stream). */
  private def dynGapSessions(events: DataFrame): DataFrame = {
    val gap = when(col("event_type") === "purchase",
      lit(s"$GapPurchase seconds")).otherwise(lit(s"$GapOther seconds"))
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purch"))
      .select(col("user_id"),
        expr("CAST(unix_timestamp(session_window.start) AS BIGINT)").as("start_sec"),
        expr("CAST(unix_timestamp(session_window.end) AS BIGINT)").as("end_sec"),
        col("n_events"), col("n_purch"))
  }

  /** x318: DYNAMIC-gap session windows — `session_window(ts, CASE …)`
    * with a per-event gap (purchase 30 min, other 10 min), the engine
    * surface fixed-gap q22/x133 never exercised: each event spawns
    * [t, t+gap_e) and overlapping-or-touching windows merge (Spark
    * merges at next.start ≤ prev.end — x133's empirically pinned
    * boundary), so the session END is the max per-event expiry, not
    * last-event + constant. The oracle sessionizes the (user, sec)
    * census with a running max of window ends — the break test is
    * sec > max(end so far), which handles a long-gap event bridging
    * PAST a short-gap successor (lag-based gap tests cannot).
    *
    * Scale: one shuffle on user_id; the census collapse first makes the
    * window pass O(distinct seconds), and same-second events always
    * co-session (their windows share a start), so the collapse is
    * lossless. */
  def dynamicGapSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"event_type")
    dynGapSessions(ev).orderBy($"user_id", $"start_sec")
  }

  /** Shared oracle body: batch dynamic-gap sessionization of the
    * second-truncated events. */
  private def dynGapOracleSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |         CAST(max(CASE WHEN event_type = 'purchase'
       |                       THEN $GapPurchase ELSE $GapOther END) AS BIGINT) AS gap
       |  FROM events GROUP BY 1, 2),
       |runs AS (
       |  SELECT user_id, sec, cnt, np, sec + gap AS endv,
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
       |  FROM brk)
       |SELECT user_id, CAST(min(sec) AS BIGINT) AS start_sec,
       |       CAST(max(endv) AS BIGINT) AS end_sec,
       |       CAST(sum(cnt) AS BIGINT) AS n_events,
       |       CAST(sum(np) AS BIGINT) AS n_purch
       |FROM sid GROUP BY user_id, s
       |ORDER BY user_id, start_sec""".stripMargin

  // ---------------------------------------------------------------- x319

  /** x319: the STREAMING side of x318 — the same dynamic-gap session
    * aggregation over a real file stream (3 ARBITRARY row splits via
    * repartition — complete mode is arrival-order-insensitive, which is
    * the point: sessions must merge correctly from any batch interleave;
    * the watermarked append-mode variant x323 is the one that stages
    * true chronological slices), maxFilesPerTrigger = 1, so the
    * session store must MERGE dynamic windows across micro-batches:
    * a purchase in batch 1 whose 30-minute window swallows a batch-2
    * click session is the state transition fixed-gap x133 cannot
    * produce. Final snapshot equals x318's batch answer on the same
    * cohort.
    *
    * Scale: session state is keyed by user, merged windows per key;
    * complete mode is the parity harness — the production deployment
    * appends with a watermark. */
  def streamDynamicGap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x319").toString
    val ev = Tables.events(spark, dir).filter($"user_id" < DynUsers)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"event_type")
    ev.repartition(3).write.mode("overwrite").parquet(s"$base/src")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val sessions = dynGapSessions(stream)
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, sessions, base, "complete")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy($"user_id", $"start_sec")
  }

  /** Streaming-cohort bound (keeps the parity run's state modest). */
  private val DynUsers = 40L

  // ---------------------------------------------------------------- x320

  /** Hash moduli for the two FIM cut points (fixed primes; splits are a
    * pure function of doc_id and length, reproducible in any engine). */
  private val FimMul1 = 2654435761L
  private val FimMod1 = 1000000007L
  private val FimMul2 = 1779033703L
  private val FimMod2 = 2147483647L

  /** x320: fill-in-the-middle span splitting — the code/infilling-model
    * data transform (Bavarian et al.: reorder each document as
    * prefix‖suffix‖middle so an autoregressive model learns infilling).
    * Two deterministic hash-derived cut points 0 ≤ c1 ≤ c2 ≤ n split
    * the text; emitted are the span lengths, the PSM-order fingerprint,
    * and the reassembly audit (prefix+middle+suffix must hash back to
    * the original — the transform is a permutation, not a lossy edit).
    *
    * Scale: map-only — no shuffle at all except the output sort;
    * per-row work is O(|text|). */
  def fimSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(length($"text") >= 2)
      .select($"doc_id", $"text", length($"text").cast("long").as("n"))
      .withColumn("c1", (($"doc_id" * FimMul1) % FimMod1) % ($"n" + 1L))
      .withColumn("c2",
        $"c1" + (($"doc_id" * FimMul2) % FimMod2) % ($"n" - $"c1" + 1L))
      .select($"doc_id", $"n", $"c1", $"c2",
        expr("substring(text, 1, CAST(c1 AS INT))").as("p"),
        expr("substring(text, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT))").as("m"),
        expr("substring(text, CAST(c2 AS INT) + 1)").as("s"),
        $"text")
      .select($"doc_id", $"n", $"c1", $"c2",
        length($"p").cast("long").as("len_p"),
        length($"m").cast("long").as("len_m"),
        length($"s").cast("long").as("len_s"),
        md5(concat($"p", lit("|"), $"s", lit("|"), $"m")).as("psm_hash"),
        (md5(concat($"p", $"m", $"s")) === md5($"text")).cast("long").as("ok"))
      .orderBy($"doc_id")
  }

  private val fimSplitOracle =
    s"""WITH cuts AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
       |         ((doc_id * $FimMul1) % $FimMod1) % (CAST(length(text) AS BIGINT) + 1) AS c1
       |  FROM documents WHERE length(text) >= 2),
       |c2s AS (
       |  SELECT *, c1 + ((doc_id * $FimMul2) % $FimMod2) % (n - c1 + 1) AS c2 FROM cuts),
       |sp AS (
       |  SELECT doc_id, n, c1, c2,
       |         substring(text, 1, CAST(c1 AS INT)) AS p,
       |         substring(text, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT)) AS m,
       |         substring(text, CAST(c2 AS INT) + 1) AS s, text
       |  FROM c2s)
       |SELECT doc_id, n, c1, c2,
       |       CAST(length(p) AS BIGINT) AS len_p,
       |       CAST(length(m) AS BIGINT) AS len_m,
       |       CAST(length(s) AS BIGINT) AS len_s,
       |       md5(p || '|' || s || '|' || m) AS psm_hash,
       |       CAST(CASE WHEN md5(p || m || s) = md5(text) THEN 1 ELSE 0 END AS BIGINT) AS ok
       |FROM sp
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x321

  /** Overflow-forcing multiplier for the try_multiply arm (cents above
    * ⌊Long.Max / this⌋ = 10,399,562 overflow and must yield NULL, not an
    * error). Sized so overflow hits ~1% of rows (the fixture's cents
    * p99–max band): TryExpression catches a JVM ArithmeticException per
    * overflowing row, and a first cut that overflowed HALF the corpus
    * spent 10 s/sweep on exception fill-in — the semantics pin must not
    * double as an exception-throughput benchmark. */
  private val TryMul = 886900000000L

  /** x321: `try_` arithmetic semantics pin — Spark's try_divide /
    * try_multiply return NULL where strict ANSI arithmetic raises
    * (division by zero, BIGINT overflow). DuckDB has no try_ family and
    * ERRORS on both, so the oracle reconstructs the exact NULL domain:
    * divisor = 0, and |cents| > ⌊2⁶³−1 / multiplier⌋ for the overflow
    * arm — pinning precisely WHERE the nulls appear, not just that the
    * happy path matches. Bounded output (first 60 orderkeys) plus the
    * global null-count row the engines must agree on.
    *
    * Scale: map-only projection; the null-count aggregate is one
    * map-side-combinable pass. */
  def tryArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber".cast("long").as("ln"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
        ($"l_quantity".cast("long") - 25L).as("dvs"))
      .withColumn("qdiv", expr("try_divide(cents, dvs)"))
      .withColumn("qmul", expr(s"try_multiply(cents, ${TryMul}L)"))
    val sample = rows.filter($"l_orderkey" < 60L)
      .select($"l_orderkey", $"ln", $"cents", $"dvs",
        QueryUtil.halfUp4($"qdiv").as("qdiv"), $"qmul",
        lit(null).cast("long").as("null_div"),
        lit(null).cast("long").as("null_mul"))
    val totals = rows.agg(
      sum(when($"qdiv".isNull, 1L).otherwise(0L)).as("null_div"),
      sum(when($"qmul".isNull, 1L).otherwise(0L)).as("null_mul"))
      .select(lit(-1L).as("l_orderkey"), lit(0L).as("ln"),
        lit(0L).as("cents"), lit(0L).as("dvs"),
        lit(null).cast("double").as("qdiv"), lit(null).cast("long").as("qmul"),
        $"null_div", $"null_mul")
    sample.unionByName(totals).orderBy($"l_orderkey", $"ln")
  }

  private val tryArithOracle =
    s"""WITH rows_ AS MATERIALIZED (
       |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
       |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
       |         CAST(l_quantity AS BIGINT) - 25 AS dvs
       |  FROM lineitem),
       |calc AS (
       |  SELECT *,
       |         CASE WHEN dvs = 0 THEN NULL
       |              ELSE CAST(cents AS DOUBLE) / CAST(dvs AS DOUBLE) END AS qdiv,
       |         CASE WHEN abs(cents) > 9223372036854775807 // $TryMul THEN NULL
       |              ELSE cents * $TryMul END AS qmul
       |  FROM rows_)
       |SELECT l_orderkey, ln, cents, dvs,
       |       floor(qdiv * 10000 + 0.5) / 10000.0 AS qdiv, qmul,
       |       CAST(NULL AS BIGINT) AS null_div, CAST(NULL AS BIGINT) AS null_mul
       |FROM calc WHERE l_orderkey < 60
       |UNION ALL
       |SELECT -1, 0, 0, 0, NULL, NULL,
       |       CAST(sum(CASE WHEN qdiv IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       |       CAST(sum(CASE WHEN qmul IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |FROM calc
       |ORDER BY l_orderkey, ln""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x317_holt_linear",
      "Holt linear-trend smoothing as an exact truncating-div integer recurrence: typed per-key fold vs recursive-CTE oracle",
      holtLinear, Some(holtLinearOracle)),
    QueryDef("x318_dynamic_gap_sessions",
      "session_window with per-event dynamic gaps: running-max-of-ends oracle sessionization, merge-at-touch boundary pinned",
      dynamicGapSessions, Some(dynGapOracleSql)),
    QueryDef("x319_stream_dynamic_gap",
      "streaming dynamic-gap sessions over 3 real micro-batches: cross-batch dynamic window merge, complete-mode snapshot parity",
      streamDynamicGap, Some(
        dynGapOracleSql.replace("FROM events GROUP BY 1, 2",
          s"FROM events WHERE user_id < $DynUsers GROUP BY 1, 2"))),
    QueryDef("x320_fim_split",
      "fill-in-the-middle span split: hash-derived cut points, PSM fingerprint, lossless reassembly audit",
      fimSplit, Some(fimSplitOracle)),
    QueryDef("x321_try_arith",
      "try_divide/try_multiply NULL-domain pin: divide-by-zero and BIGINT-overflow nulls reconstructed exactly in the oracle",
      tryArith, Some(tryArithOracle)))
}
