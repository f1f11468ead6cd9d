package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 fifteenth tier: two model-fitting completions — Holt–Winters
  * ADDITIVE SEASONAL smoothing (x317's Holt with a 7-slot day-of-week
  * seasonal state; the full triple-smoothing forecaster) and Witten–Bell
  * bigram smoothing (the diversity-based interpolation family member the
  * LM suite — Kneser–Ney x149, stupid backoff x245, Good–Turing x254 —
  * still lacked, here LOG-FREE: the WB probability is an exact rational
  * quantized to micro-units, no libm anywhere).
  */
object Round13Queries15 {

  // ---------------------------------------------------------------- x343

  /** Seasonal period (day-of-series slots). */
  private val HwPeriod = 7

  /** x343: Holt–Winters additive (α = β = γ = ½) over each event type's
    * daily-cents series with a [[HwPeriod]]-slot seasonal state — the
    * exact-integer recurrence contract of x317 extended to triple
    * smoothing: lₜ = ((xₜ − s[idx]) + l + b) quot 2, bₜ = ((lₜ − l) + b)
    * quot 2, s[idx] ← ((xₜ − lₜ) + s[idx]) quot 2 with idx = (t−1) mod 7
    * and TRUNCATING division (JVM quot == DuckDB //, the pinned
    * negative-state convention). Init l₁ = x₁, b₁ = 0, s ≡ 0. The
    * 7-day-ahead forecast lands on the same seasonal slot as the last
    * observation: f₇ = l + 7b + s[(n−1) mod 7]. Engine side is a typed
    * groupByKey fold over each key's day census; the oracle steps the
    * identical trajectory as a recursive CTE carrying all seven seasonal
    * columns.
    *
    * Scale: the corpus pass is the map-side-combinable daily census; the
    * sequential fold touches one key's day series (time-bounded, not
    * corpus-bounded). */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Round13Queries3.dailyCents(spark, dir).as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val xs = it.toArray.sortBy(_._2).map(_._3)
        var l = xs.head
        var b = 0L
        val s = Array.fill(HwPeriod)(0L)
        (2 to xs.length).foreach { i =>
          val x = xs(i - 1)
          val idx = (i - 1) % HwPeriod
          val lPrev = l
          l = ((x - s(idx)) + l + b) / 2L
          b = ((l - lPrev) + b) / 2L
          s(idx) = ((x - l) + s(idx)) / 2L
        }
        val fc = l + 7L * b + s((xs.length - 1) % HwPeriod)
        (k, xs.length.toLong, l, b, s(0), s(1), s(2), s(3), s(4), s(5), s(6), fc)
      }
      .toDF("event_type", "n_days", "level", "trend",
        "s0", "s1", "s2", "s3", "s4", "s5", "s6", "forecast7")
      .orderBy($"event_type")
  }

  private val holtWintersOracle = {
    val sidx = "CASE (s.i - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 " +
      "WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END"
    val lnew = s"(((s.cents - ($sidx)) + r.l + r.b) // 2)"
    val bnew = s"((($lnew) - r.l + r.b) // 2)"
    def snew(k: Int) =
      s"CASE WHEN (s.i - 1) % 7 = $k THEN ((s.cents - ($lnew)) + r.s$k) // 2 ELSE r.s$k END AS s$k"
    val sCols = (0 until HwPeriod).map(snew).mkString(",\n         ")
    val fidx = "CASE (n.nn - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 " +
      "WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END"
    s"""WITH RECURSIVE daily AS MATERIALIZED (
       |  SELECT event_type,
       |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
       |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |seq AS MATERIALIZED (
       |  SELECT event_type, cents,
       |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
       |  FROM daily),
       |rec AS (
       |  SELECT event_type, i, cents AS l, CAST(0 AS BIGINT) AS b,
       |         CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
       |         CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
       |         CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
       |         CAST(0 AS BIGINT) AS s6
       |  FROM seq WHERE i = 1
       |  UNION ALL
       |  SELECT s.event_type, s.i,
       |         $lnew AS l,
       |         $bnew AS b,
       |         $sCols
       |  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1),
       |n AS (SELECT event_type, max(i) AS nn FROM seq GROUP BY 1)
       |SELECT r.event_type, n.nn AS n_days, r.l AS level, r.b AS trend,
       |       r.s0, r.s1, r.s2, r.s3, r.s4, r.s5, r.s6,
       |       r.l + 7 * r.b + ($fidx) AS forecast7
       |FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.nn
       |ORDER BY r.event_type""".stripMargin
  }

  // ---------------------------------------------------------------- x344

  /** x344: Witten–Bell smoothed bigram LM — interpolation weight from
    * CONTINUATION DIVERSITY: p(w|v) = (c(vw) + T(v)·p_uni(w)) /
    * (c(v) + T(v)) with T(v) = distinct continuations of v. Trained on
    * even docs, scored on odd docs (the x240/x245 held-out split). The
    * probability is kept EXACT: p = (c(vw)·N + T(v)·c(w)) /
    * (N·(c(v)+T(v))), micro-quantized with truncating division, the
    * product in DECIMAL(38)/HUGEINT (c(vw)·N·10⁶ passes 2⁶³ at ~10⁶
    * train tokens — the x330 rule). Unseen histories back off to the
    * quantized unigram c(w)·10⁶ DIV N (0 for unseen w). No logs — the
    * whole score path is integer.
    *
    * Scale: count tables are vocab-bounded and broadcast; the token
    * stream shuffles once on doc_id for the lag window (x245's audited
    * shape). */
  def wittenBell(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"i")
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("i", "w2")))
      .withColumn("w1", lag($"w2", 1).over(w))
    val train = tok.filter($"doc_id" % 2 === 0)
    val score = tok.filter($"doc_id" % 2 === 1 && $"w1".isNotNull)
    val cvw = train.filter($"w1".isNotNull)
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("cvw"))
    val hist = train.filter($"w1".isNotNull)
      .groupBy($"w1").agg(count(lit(1)).as("cv"), countDistinct($"w2").as("tv"))
    val uni = train.groupBy($"w2").agg(count(lit(1)).as("cw"))
    val nTot = train.agg(count(lit(1)).as("n_tok"))
    val pMicro = expr(
      """CASE WHEN cv IS NOT NULL THEN
        |  CAST((CAST(COALESCE(cvw, 0) AS DECIMAL(38,0)) * n_tok
        |        + CAST(tv AS DECIMAL(38,0)) * COALESCE(cw, 0)) * 1000000
        |       DIV (CAST(n_tok AS DECIMAL(38,0)) * (cv + tv)) AS BIGINT)
        |ELSE (COALESCE(cw, 0) * 1000000) DIV n_tok END""".stripMargin)
    score
      .join(broadcast(cvw), Seq("w1", "w2"), "left")
      .join(broadcast(hist), Seq("w1"), "left")
      .join(broadcast(uni), Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .select($"doc_id", when($"cv".isNull, 1L).otherwise(0L).as("unseen"),
        pMicro.as("p_micro"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_scored"), sum($"unseen").as("n_unseen_hist"),
        sum($"p_micro").as("sum_p"))
      .select($"doc_id", $"n_scored", $"n_unseen_hist", $"sum_p",
        QueryUtil.halfUp4($"sum_p".cast("double") / 1e6 / $"n_scored").as("avg_p"))
      .orderBy($"doc_id")
  }

  private val wittenBellOracle =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |e0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
      |tok AS MATERIALIZED (
      |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w2,
      |         CASE WHEN i > 1 THEN toks[CAST(i AS INTEGER) - 1] END AS w1
      |  FROM e0),
      |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
      |score AS (SELECT * FROM tok WHERE doc_id % 2 = 1 AND w1 IS NOT NULL),
      |cvw AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cvw
      |        FROM train WHERE w1 IS NOT NULL GROUP BY 1, 2),
      |hist AS (SELECT w1, CAST(count(*) AS BIGINT) AS cv,
      |                CAST(count(DISTINCT w2) AS BIGINT) AS tv
      |         FROM train WHERE w1 IS NOT NULL GROUP BY 1),
      |uni AS (SELECT w2, CAST(count(*) AS BIGINT) AS cw FROM train GROUP BY 1),
      |ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM train),
      |scored AS (
      |  SELECT s.doc_id,
      |         CASE WHEN h.cv IS NULL THEN 1 ELSE 0 END AS unseen,
      |         CASE WHEN h.cv IS NOT NULL THEN
      |           CAST((CAST(COALESCE(c.cvw, 0) AS HUGEINT) * n.n_tok
      |                 + CAST(h.tv AS HUGEINT) * COALESCE(u.cw, 0)) * 1000000
      |                // (CAST(n.n_tok AS HUGEINT) * (h.cv + h.tv)) AS BIGINT)
      |         ELSE (COALESCE(u.cw, 0) * 1000000) // n.n_tok END AS p_micro
      |  FROM score s
      |  LEFT JOIN cvw c ON c.w1 = s.w1 AND c.w2 = s.w2
      |  LEFT JOIN hist h ON h.w1 = s.w1
      |  LEFT JOIN uni u ON u.w2 = s.w2
      |  CROSS JOIN ntot n)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
      |       CAST(sum(unseen) AS BIGINT) AS n_unseen_hist,
      |       CAST(sum(p_micro) AS BIGINT) AS sum_p,
      |       floor(CAST(sum(p_micro) AS DOUBLE) / 1e6 / count(*) * 10000 + 0.5) / 10000.0 AS avg_p
      |FROM scored GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x343_holt_winters",
      "Holt-Winters additive seasonal smoothing: exact integer triple recurrence with a 7-slot seasonal state, recursive-CTE oracle",
      holtWinters, Some(holtWintersOracle)),
    QueryDef("x344_witten_bell",
      "Witten-Bell smoothed bigram LM on the held-out split: diversity-weighted interpolation as exact micro-quantized rationals",
      wittenBell, Some(wittenBellOracle)))
}
