package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 sixteenth tier: readability scoring and survival-model
  * evaluation — Flesch–Kincaid grade level (the classic text-quality
  * signal beside x42's heuristic quality score, from pure integer
  * censuses: words, pseudo-sentences, vowel-group syllables) and
  * Harrell's C-index (concordance of a risk score with survival order
  * under right-censoring — the standard survival-analysis companion to
  * x197 Kaplan–Meier / x198 log-rank, and rank-identity kin of x113's
  * AUC).
  */
object Round13Queries16 {

  /** Pseudo-sentence length: the corpus has no punctuation, so sentences
    * are fixed 10-word windows — documented, deterministic, and the same
    * on both engines. */
  private val SentWords = 10L

  /** Survival-panel cap: the C-index pair join is panel², so the panel
    * must be bounded whatever the corpus (first [[CPanel]] user ids). */
  private val CPanel = 2000L

  // ---------------------------------------------------------------- x345

  /** x345: Flesch–Kincaid grade level per document. Words = space-split
    * count, sentences = ⌈words/10⌉ (pseudo-sentences), syllables =
    * count of [aeiouy]+ vowel groups over the whole text (spaces break
    * groups, so no per-word explode is needed — ONE regex scan per doc;
    * the regex text is Java-regex/RE2-portable per the x159 rule).
    * grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59 computed as identical
    * doubles from the three BIGINT censuses, halfUp4-quantized.
    *
    * Scale: embarrassingly parallel per-document projection — no
    * shuffle at all beyond the final ORDER BY. */
  /** The shared FK census: (doc_id, words, sents, syls) — one copy feeds
    * both the x345 query and the capstone-v8 gate so the two can never
    * drift. */
  private def fkCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("words"),
        size(regexp_extract_all($"text", lit("[aeiouy]+"), lit(0))).cast("long").as("syls"))
      .withColumn("sents", expr(s"(words + ${SentWords - 1}) DIV $SentWords"))
  }

  /** The FK grade expression over [[fkCensus]] columns. */
  private def fkGrade(spark: SparkSession): Column = {
    import spark.implicits._
    lit(0.39) * ($"words".cast("double") / $"sents".cast("double")) +
      lit(11.8) * ($"syls".cast("double") / $"words".cast("double")) - lit(15.59)
  }

  def fleschKincaid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fkCensus(spark, dir).select($"doc_id", $"words", $"sents", $"syls",
      QueryUtil.halfUp4(fkGrade(spark)).as("fk_grade"))
      .orderBy($"doc_id")
  }

  private val fleschKincaidOracle =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
       |         CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syls
       |  FROM documents),
       |s AS (
       |  SELECT *, (words + ${SentWords - 1}) // $SentWords AS sents FROM base)
       |SELECT doc_id, words, sents, syls,
       |       floor((0.39 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
       |              + 11.8 * (CAST(syls AS DOUBLE) / CAST(words AS DOUBLE))
       |              - 15.59) * 10000 + 0.5) / 10000.0 AS fk_grade
       |FROM s ORDER BY doc_id""".stripMargin

  /** FK-grade band the capstone-v8 readability gate keeps (trims both
    * tails of the fixture's ~0.5–8.4 grade range; endpoints are exactly
    * representable doubles and the grade itself is an identical double
    * on both engines, so the band flag is engine-deterministic). */
  private[queries] val FkLo = 3.0
  private[queries] val FkHi = 7.0

  /** x345's grade reduced to surviving doc ids — the capstone-v8 gate. */
  private[graft] def readabilityKeepIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = fkGrade(spark)
    fkCensus(spark, dir).filter(g >= FkLo && g <= FkHi).select($"doc_id")
  }

  /** Splice-ready CTE block ending in `read_keep(doc_id)` — the
    * capstone-v8 readability gate. */
  private[queries] lazy val readKeepCtes: String =
    s"""read_base AS (
       |  SELECT doc_id,
       |         0.39 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
       |         + 11.8 * (CAST(syls AS DOUBLE) / CAST(words AS DOUBLE)) - 15.59 AS fk
       |  FROM (SELECT doc_id,
       |               CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
       |               (CAST(len(string_split(text, ' ')) AS BIGINT) + ${SentWords - 1}) // $SentWords AS sents,
       |               CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syls
       |        FROM documents)),
       |read_keep AS (SELECT doc_id FROM read_base WHERE fk >= $FkLo AND fk <= $FkHi)""".stripMargin

  // ---------------------------------------------------------------- x346

  /** x346: Harrell's concordance index — does a user's activity volume
    * (risk score = event count) predict how soon their observation
    * window ends? Survival framing over events: time = observation span
    * in minutes (epoch-µs arithmetic, µs-aligned fixture so DIV is
    * lossless), event = user ever purchased (else right-censored at
    * span end). A pair is COMPARABLE iff the earlier-ending subject had
    * the event; concordant when that subject also carries the HIGHER
    * risk score, score ties count ½. C = (2·nc + nt)/(2·ncomp) kept as
    * exact integers and micro-quantized with truncating division.
    *
    * Scale: the pair join is capped at [[CPanel]]² whatever the corpus —
    * the x234 TauTop precedent (an UNCAPPED user panel went 12× slower
    * at 10× data in the r13 scale sweep: users² is quadratic) — and
    * everything before it is one map-side-combinable groupBy(user). */
  /** The shared survival frame: (user_id, t_min, e, score) — observation
    * span in minutes, purchase = event, activity volume as risk score.
    * One copy feeds x346 (capped pair census) and x358 (Nelson–Aalen)
    * so the Kaplan–Meier-family queries really share their framing. */
  private[graft] def survivalSubjects(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        (unix_micros(max($"ts").cast("timestamp")) -
          unix_micros(min($"ts").cast("timestamp"))).as("span_us"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("score"))
      .select($"user_id", expr("span_us DIV 60000000").as("t_min"),
        when($"np" > 0L, 1L).otherwise(0L).as("e"), $"score")
  }

  /** The oracle-side rendering of [[survivalSubjects]] (body of a
    * `subj AS (...)` CTE, without panel cap). */
  private[graft] val survivalSubjectsSql =
    """SELECT user_id,
      |         (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS t_min,
      |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
      |              THEN 1 ELSE 0 END AS e,
      |         CAST(count(*) AS BIGINT) AS score
      |  FROM events GROUP BY user_id""".stripMargin

  def harrellC(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subj = survivalSubjects(spark, dir)
      .withColumn("panel_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"user_id")))
      .filter($"panel_rk" <= CPanel)
      .drop("panel_rk")
      .localCheckpoint(true)
    val pairs = subj.toDF("u1", "t1", "e1", "s1")
      .join(subj.toDF("u2", "t2", "e2", "s2"), $"u1" < $"u2")
      .filter($"t1" =!= $"t2")
      .select(
        when($"t1" < $"t2", $"e1").otherwise($"e2").as("e_early"),
        when($"t1" < $"t2", $"s1").otherwise($"s2").as("s_early"),
        when($"t1" < $"t2", $"s2").otherwise($"s1").as("s_late"))
      .filter($"e_early" === 1L)
    val agg = pairs.agg(
      count(lit(1)).as("ncomp"),
      sum(when($"s_early" > $"s_late", 1L).otherwise(0L)).as("nc"),
      sum(when($"s_early" === $"s_late", 1L).otherwise(0L)).as("nt"))
    agg.select($"ncomp", $"nc", $"nt",
      expr("((2 * nc + nt) * 1000000) DIV (2 * ncomp)").as("c_micro"),
      QueryUtil.halfUp4((lit(2.0) * $"nc" + $"nt").cast("double") /
        (lit(2.0) * $"ncomp").cast("double")).as("c_index"))
  }

  private val harrellCOracle =
    s"""WITH subj AS MATERIALIZED (
      |  SELECT * FROM ($survivalSubjectsSql)
      |  ORDER BY user_id LIMIT $CPanel),
      |pairs AS (
      |  SELECT CASE WHEN a.t_min < b.t_min THEN a.e ELSE b.e END AS e_early,
      |         CASE WHEN a.t_min < b.t_min THEN a.score ELSE b.score END AS s_early,
      |         CASE WHEN a.t_min < b.t_min THEN b.score ELSE a.score END AS s_late
      |  FROM subj a JOIN subj b ON a.user_id < b.user_id
      |  WHERE a.t_min <> b.t_min),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS ncomp,
      |         CAST(sum(CASE WHEN s_early > s_late THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |         CAST(sum(CASE WHEN s_early = s_late THEN 1 ELSE 0 END) AS BIGINT) AS nt
      |  FROM pairs WHERE e_early = 1)
      |SELECT ncomp, nc, nt,
      |       ((2 * nc + nt) * 1000000) // (2 * ncomp) AS c_micro,
      |       floor((2.0 * nc + nt) / (2.0 * ncomp) * 10000 + 0.5) / 10000.0 AS c_index
      |FROM agg""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x345_flesch_kincaid",
      "Flesch-Kincaid grade per doc: word/pseudo-sentence/vowel-group censuses, one portable regex scan, no explode",
      fleschKincaid, Some(fleschKincaidOracle)),
    QueryDef("x346_harrell_c",
      "Harrell's C-index: survival concordance of the activity risk score, exact pair censuses with half-credit ties",
      harrellC, Some(harrellCOracle)))
}
