package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twelfth tier: experimentation analytics (two-proportion
  * significance screen in exact integer arithmetic), audio-visual stream
  * alignment (the multimodal training-pair assembly join), and chat-turn
  * conversation assembly (the SFT example-prep shape). */
object Round10Queries12 {

  /** q104: A/B-test two-proportion z-test screen — per goal event type,
    * split users 50/50 by a deterministic md5 bucket (q36's
    * hash-Bernoulli, so assignment is rerun/engine-stable), measure
    * "user reached the goal at least once", and decide 95% significance
    * with the pooled two-proportion z-test. The whole test is evaluated
    * as ONE cross-multiplied integer predicate:
    *
    *   (c1·n2 − c2·n1)² · N · 10000  >  38416 · n1 · n2 · c · (N − c)
    *
    * (z² > 1.96² = 3.8416, c = c1+c2, N = n1+n2) — no float mean, no
    * sqrt, no ulp drift; the products run in DECIMAL(38)/HUGEINT so the
    * ~10²⁵ intermediate cannot overflow. The per-goal rates are reported
    * half-up for reading; the DECISION never touches them.
    *
    * Scale: one distinct-(user, goal) aggregate + a users-sized distinct
    * — two key shuffles; the test itself is O(goals) arithmetic. */
  def abSignificance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type",
        (substring(md5($"user_id".cast("string")), 1, 1) < "8").as("in_a"))
    val users = ev.select($"user_id", $"in_a").distinct()
    val totals = users.agg(
      sum(when($"in_a", 1L).otherwise(0L)).as("n1"),
      sum(when(!$"in_a", 1L).otherwise(0L)).as("n2"))
    val conv = ev.select($"event_type", $"user_id", $"in_a").distinct()
      .groupBy($"event_type")
      .agg(sum(when($"in_a", 1L).otherwise(0L)).as("c1"),
        sum(when(!$"in_a", 1L).otherwise(0L)).as("c2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    conv.crossJoin(broadcast(totals))
      .withColumn("diff", d($"c1") * d($"n2") - d($"c2") * d($"n1"))
      .withColumn("nn", d($"n1") + d($"n2"))
      .withColumn("cc", d($"c1") + d($"c2"))
      .select($"event_type", $"n1", $"c1", $"n2", $"c2",
        QueryUtil.halfUp4($"c1".cast("double") / $"n1".cast("double")).as("rate_a"),
        QueryUtil.halfUp4($"c2".cast("double") / $"n2".cast("double")).as("rate_b"),
        ($"diff" * $"diff" * $"nn" * lit(10000) >
          lit(38416) * d($"n1") * d($"n2") * $"cc" * ($"nn" - $"cc"))
          .cast("int").as("significant_95"))
      .orderBy("event_type")
  }

  private val abSignificanceOracle =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, event_type,
      |         substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS in_a
      |  FROM events),
      |u AS (SELECT DISTINCT user_id, in_a FROM ev),
      |t AS (SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n2
      |      FROM u),
      |c AS (SELECT event_type,
      |             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c2
      |      FROM (SELECT DISTINCT event_type, user_id, in_a FROM ev)
      |      GROUP BY event_type)
      |SELECT c.event_type, t.n1, c.c1, t.n2, c.c2,
      |       floor(CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS rate_a,
      |       floor(CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS rate_b,
      |       CAST(
      |         (CAST(c.c1 AS HUGEINT) * t.n2 - CAST(c.c2 AS HUGEINT) * t.n1)
      |             * (CAST(c.c1 AS HUGEINT) * t.n2 - CAST(c.c2 AS HUGEINT) * t.n1)
      |             * (CAST(t.n1 AS HUGEINT) + t.n2) * 10000
      |           > 38416 * CAST(t.n1 AS HUGEINT) * t.n2
      |             * (CAST(c.c1 AS HUGEINT) + c.c2)
      |             * ((CAST(t.n1 AS HUGEINT) + t.n2) - (CAST(c.c1 AS HUGEINT) + c.c2))
      |         AS INTEGER) AS significant_95
      |FROM c, t
      |ORDER BY c.event_type""".stripMargin

  /** x164: audio-visual alignment — the multimodal training-pair assembly
    * join: every sampled video frame (x71's stage, everyK=3) is matched
    * to the overlapping audio windows (x72's stage, frame=64/hop=32) of
    * the SAME document by payload-position overlap, then each frame picks
    * its best-energy window (the "align caption audio to keyframe" shape
    * a captioning/AV-pretraining pipeline runs). The Spark join is the
    * x62 banded equi-join on 64-byte position bands with
    * responsibility-band dedup (pair counted only where its overlap
    * starts) — never an all-pairs inequality join; the oracle runs the
    * literal interval-overlap join.
    *
    * Scale: both sides are partition-local 1→N decode stages; the
    * alignment is a (doc_id, band)-keyed equi-join — band fan-out is
    * bounded by span/64, so candidate pairs stay linear in media length.
    * The fixture payload is pure-ASCII text (char == byte), which keeps
    * frame CHARACTER slices and audio BYTE windows on one axis. */
  def avAlign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = 64 // alignment band width (bytes)
    val media = Multimodal.attachFakeMedia(Tables.documents(spark, dir))
    val meta = Multimodal.decodeMeta(media).toDF()
      .select($"doc_id", $"media_len", $"n_frames",
        greatest(lit(1), floor($"media_len" / $"n_frames")).cast("int").as("stride"))
    val frames = Multimodal.sampleFrames(media, everyK = 3).toDF()
      .select($"doc_id", $"frame_idx", length($"frame").cast("int").as("f_len"))
      .join(meta.select($"doc_id", $"stride"), "doc_id")
      .select($"doc_id", $"frame_idx",
        ($"frame_idx" * $"stride").as("f_start"),
        ($"frame_idx" * $"stride" + $"f_len").as("f_end"))
    val wins = Multimodal.audioWindows(media, frame = 64, hop = 32).toDF()
      .select($"doc_id", $"win_idx",
        ($"win_idx" * 32).as("w_start"),
        ($"win_idx" * 32 + $"n_samples").as("w_end"),
        $"energy")
    val fb = frames.withColumn("band",
      explode(sequence(floor($"f_start" / B).cast("int"),
        floor(($"f_end" - 1) / B).cast("int"))))
    val wb = wins.withColumn("band",
      explode(sequence(floor($"w_start" / B).cast("int"),
        floor(($"w_end" - 1) / B).cast("int"))))
    val pairs = fb.join(wb, Seq("doc_id", "band"))
      .filter($"f_start" < $"w_end" && $"w_start" < $"f_end")
      // responsibility band: count the pair only where its overlap starts
      .filter($"band" === floor(greatest($"f_start", $"w_start") / B).cast("int"))
      .select($"doc_id", $"frame_idx", $"win_idx", $"energy",
        (least($"f_end", $"w_end") - greatest($"f_start", $"w_start")).as("ov"))
    val w = Window.partitionBy($"doc_id", $"frame_idx")
      .orderBy($"energy".desc, $"win_idx")
    pairs.withColumn("rn", row_number().over(w))
      .groupBy($"doc_id", $"frame_idx")
      .agg(count(lit(1)).cast("int").as("n_win"),
        sum($"ov").as("ov_chars"),
        max(when($"rn" === 1, $"win_idx")).as("best_win"))
      .orderBy("doc_id", "frame_idx")
  }

  private val avAlignOracle = {
    def nibOf(expr: String, i: Int) =
      s"(strpos('0123456789abcdef', substr(md5($expr), ${i + 1}, 1)) - 1)"
    s"""WITH m AS (SELECT doc_id, text,
       |             1 + ${nibOf("text", 0)} % 30 AS n_frames,
       |             length(text) AS clen
       |           FROM documents),
       |s AS (SELECT doc_id, text, clen, n_frames,
       |             greatest(1, clen // n_frames) AS stride
       |      FROM m),
       |fr0 AS (SELECT doc_id, text, clen, stride, unnest(range(0, n_frames)) AS i FROM s),
       |fr AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |         CAST(i * stride AS BIGINT) AS f_start,
       |         CAST(i * stride + strlen(substr(text, CAST(i * stride + 1 AS INTEGER),
       |                                         CAST(stride AS INTEGER))) AS BIGINT) AS f_end
       |  FROM fr0 WHERE i % 3 = 0 AND i * stride < clen),
       |wn AS MATERIALIZED (
       |  SELECT doc_id, CAST(k AS INTEGER) AS win_idx,
       |         CAST(k * 32 AS BIGINT) AS w_start,
       |         CAST(k * 32 + least(64, n - k * 32) AS BIGINT) AS w_end,
       |         CAST(list_sum(list_transform(range(k * 32 + 1, least(k * 32 + 64, n) + 1),
       |                i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT) AS energy
       |  FROM (SELECT doc_id, text, length(text) AS n,
       |               unnest(range(0, ((length(text) - 1) // 32) + 1)) AS k
       |        FROM documents WHERE length(text) > 0)),
       |p AS (SELECT fr.doc_id, fr.frame_idx, wn.win_idx, wn.energy,
       |             least(fr.f_end, wn.w_end) - greatest(fr.f_start, wn.w_start) AS ov,
       |             row_number() OVER (PARTITION BY fr.doc_id, fr.frame_idx
       |                                ORDER BY wn.energy DESC, wn.win_idx) AS rn
       |      FROM fr JOIN wn
       |        ON fr.doc_id = wn.doc_id
       |       AND fr.f_start < wn.w_end AND wn.w_start < fr.f_end)
       |SELECT doc_id, frame_idx,
       |       CAST(count(*) AS INTEGER) AS n_win,
       |       CAST(sum(ov) AS BIGINT) AS ov_chars,
       |       max(CASE WHEN rn = 1 THEN win_idx END) AS best_win
       |FROM p
       |GROUP BY doc_id, frame_idx
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** x165 cohort bound (keeps the conversation table readable). */
  private val ChatUsers = 60

  /** x165: chat-turn conversation assembly — the SFT/chat-template
    * example-prep shape: each user's event stream becomes a multi-turn
    * conversation (odd rank → user turn, even → assistant), rendered as
    * 'role|event_type' lines joined in time order, with the md5 digest
    * pinning the exact template output. The rebuild is the x55
    * collect_list + array_sort fold (one user_id shuffle), so the
    * assembly is deterministic under any partitioning — the property a
    * distributed template renderer must have.
    *
    * Scale: one user_id-keyed shuffle; conversations build
    * partition-locally from sorted structs. */
  def chatAssembly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .filter($"user_id" < ChatUsers)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("turn", row_number().over(w))
      .withColumn("line",
        concat(when($"turn" % 2 === 1, "user").otherwise("assistant"),
          lit("|"), $"event_type"))
      .groupBy($"user_id")
      .agg(count(lit(1)).cast("int").as("n_turns"),
        sum(when($"turn" % 2 === 1, 1).otherwise(0)).cast("int").as("n_user_turns"),
        md5(array_join(
          transform(sort_array(collect_list(struct($"turn", $"line"))),
            s => s.getField("line")),
          "\n")).as("convo_md5"))
      .orderBy("user_id")
  }

  private val chatAssemblyOracle =
    s"""WITH t AS (
       |  SELECT user_id, event_type,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
       |  FROM events WHERE user_id < $ChatUsers)
       |SELECT user_id,
       |       CAST(count(*) AS INTEGER) AS n_turns,
       |       CAST(sum(CASE WHEN turn % 2 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_user_turns,
       |       md5(string_agg(
       |         (CASE WHEN turn % 2 = 1 THEN 'user' ELSE 'assistant' END) || '|' || event_type,
       |         chr(10) ORDER BY turn)) AS convo_md5
       |FROM t
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q104_ab_significance",
      "two-proportion A/B significance screen per goal: one cross-multiplied exact-integer z-test predicate",
      abSignificance, Some(abSignificanceOracle)),
    QueryDef("x164_av_align",
      "audio-visual alignment: banded interval join of sampled frames to overlapping audio windows, best-energy pick",
      avAlign, Some(avAlignOracle)),
    QueryDef("x165_chat_assembly",
      "chat-turn conversation assembly from event streams: role-tagged lines, order-pinned md5 digest",
      chatAssembly, Some(chatAssemblyOracle)))
}
