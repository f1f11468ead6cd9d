package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 twenty-second tier: three census-shaped statistics rounding
  * out their families — Mood's median test (k-group location via the
  * global-median dichotomy; the coarse, assumption-free sibling of
  * x310's Kruskal–Wallis), partial correlation (the x235 moment-algebra
  * machinery extended to a third controlled variable), and the
  * Nelson–Aalen cumulative-hazard estimator (the counting-process
  * companion to x197's Kaplan–Meier).
  */
object Round13Queries22 {

  /** χ²(2, 0.05). */
  private val Chi2Crit2 = 5.991464547

  // ---------------------------------------------------------------- x356

  /** x356: Mood's median test — do the three return flags share a common
    * quantity median? The GLOBAL doubled median comes off the value
    * census (lo+hi rank values, exact); each group then splits into
    * above (2v > m2) vs not-above, and the 2×3 table's χ² = Σ(O−E)²/E is
    * computed from the six BIGINT cell counts with expectations
    * E = rowTotal·colTotal/N as identical doubles. sig at χ²₀.₀₅,₂.
    *
    * Scale: one map-side-combinable value census; the dichotomy and the
    * χ² run on ≤ 50 rows. */
  def moodsMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("v"), $"l_returnflag".as("g"))
      .groupBy($"v")
      .agg(sum(when($"g" === "A", 1L).otherwise(0L)).as("ca"),
        sum(when($"g" === "N", 1L).otherwise(0L)).as("cn"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("cr"))
      .withColumn("t", $"ca" + $"cn" + $"cr")
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
    val cum = census.withColumn("cumt", sum($"t").over(w))
    val tot = census.agg(sum($"t").as("nn"))
    val med = cum.crossJoin(broadcast(tot)).agg(
      first($"nn").as("nn"),
      (min(when($"cumt" >= expr("(nn + 1) DIV 2"), $"v")) +
        min(when($"cumt" >= expr("(nn + 2) DIV 2"), $"v"))).as("m2"))
    val cells = census.crossJoin(broadcast(med)).agg(
      first($"nn").as("nn"), first($"m2").as("m2"),
      sum(when(lit(2L) * $"v" > $"m2", $"ca").otherwise(0L)).as("a_ab"),
      sum(when(lit(2L) * $"v" > $"m2", $"cn").otherwise(0L)).as("n_ab"),
      sum(when(lit(2L) * $"v" > $"m2", $"cr").otherwise(0L)).as("r_ab"),
      sum($"ca").as("a_tot"), sum($"cn").as("n_tot"), sum($"cr").as("r_tot"))
    def d(c: Column) = c.cast("double")
    val abTot = d($"a_ab") + d($"n_ab") + d($"r_ab")
    val nn = d($"nn")
    def cellChi(o: Column, rowT: Column, colT: Column) = {
      val e = rowT * colT / nn
      (d(o) - e) * (d(o) - e) / e
    }
    val chi2 = cellChi($"a_ab", abTot, d($"a_tot")) +
      cellChi($"n_ab", abTot, d($"n_tot")) +
      cellChi($"r_ab", abTot, d($"r_tot")) +
      cellChi($"a_tot" - $"a_ab", nn - abTot, d($"a_tot")) +
      cellChi($"n_tot" - $"n_ab", nn - abTot, d($"n_tot")) +
      cellChi($"r_tot" - $"r_ab", nn - abTot, d($"r_tot"))
    cells.select($"nn", $"m2", $"a_ab", $"n_ab", $"r_ab",
      $"a_tot", $"n_tot", $"r_tot",
      QueryUtil.halfUp4(chi2).as("chi2"),
      when(chi2 > Chi2Crit2, 1L).otherwise(0L).as("sig"))
  }

  private val moodsMedianOracle =
    s"""WITH census AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS v,
       |         CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
       |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
       |  FROM lineitem GROUP BY 1),
       |cum AS (
       |  SELECT *, ca + cn + cr AS t,
       |         sum(ca + cn + cr) OVER (ORDER BY v) AS cumt
       |  FROM census),
       |tot AS (SELECT CAST(sum(ca + cn + cr) AS BIGINT) AS nn FROM census),
       |med AS (
       |  SELECT CAST(any_value(nn) AS BIGINT) AS nn,
       |         CAST(min(CASE WHEN cumt >= (nn + 1) // 2 THEN v END)
       |            + min(CASE WHEN cumt >= (nn + 2) // 2 THEN v END) AS BIGINT) AS m2
       |  FROM cum CROSS JOIN tot),
       |cells AS (
       |  SELECT any_value(m.nn) AS nn, any_value(m.m2) AS m2,
       |         CAST(sum(CASE WHEN 2 * v > m.m2 THEN ca ELSE 0 END) AS BIGINT) AS a_ab,
       |         CAST(sum(CASE WHEN 2 * v > m.m2 THEN cn ELSE 0 END) AS BIGINT) AS n_ab,
       |         CAST(sum(CASE WHEN 2 * v > m.m2 THEN cr ELSE 0 END) AS BIGINT) AS r_ab,
       |         CAST(sum(ca) AS BIGINT) AS a_tot, CAST(sum(cn) AS BIGINT) AS n_tot,
       |         CAST(sum(cr) AS BIGINT) AS r_tot
       |  FROM census CROSS JOIN med m),
       |stat AS (
       |  SELECT *,
       |    (CAST(a_ab AS DOUBLE) + CAST(n_ab AS DOUBLE) + CAST(r_ab AS DOUBLE)) AS ab_tot
       |  FROM cells),
       |chi AS (
       |  SELECT *,
       |    (CAST(a_ab AS DOUBLE) - ab_tot * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(a_ab AS DOUBLE) - ab_tot * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / (ab_tot * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |  + (CAST(n_ab AS DOUBLE) - ab_tot * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(n_ab AS DOUBLE) - ab_tot * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / (ab_tot * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |  + (CAST(r_ab AS DOUBLE) - ab_tot * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(r_ab AS DOUBLE) - ab_tot * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / (ab_tot * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |  + (CAST(a_tot - a_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(a_tot - a_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / ((CAST(nn AS DOUBLE) - ab_tot) * CAST(a_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |  + (CAST(n_tot - n_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(n_tot - n_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / ((CAST(nn AS DOUBLE) - ab_tot) * CAST(n_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |  + (CAST(r_tot - r_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      * (CAST(r_tot - r_ab AS DOUBLE) - (CAST(nn AS DOUBLE) - ab_tot) * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE))
       |      / ((CAST(nn AS DOUBLE) - ab_tot) * CAST(r_tot AS DOUBLE) / CAST(nn AS DOUBLE)) AS chi2_raw
       |  FROM stat)
       |SELECT nn, m2, a_ab, n_ab, r_ab, a_tot, n_tot, r_tot,
       |       floor(chi2_raw * 10000 + 0.5) / 10000.0 AS chi2,
       |       CAST(CASE WHEN chi2_raw > $Chi2Crit2 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM chi""".stripMargin

  // ---------------------------------------------------------------- x357

  /** x357: partial correlation r_xy·z — is quantity still correlated
    * with line revenue once the DISCOUNT level is controlled for? The
    * sufficient statistic is the exact BIGINT moment census (n, Σ, Σ²
    * and cross-sums of x = quantity, y = revenue DOLLARS — floored to
    * keep Σy² within 2⁶³ at GenScale sf1 — z = discount cents); the
    * three pairwise Pearson r's and the partial
    * (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) are one identical double
    * projection. Extends x235's multi-OLS moment algebra to the
    * control-variable question.
    *
    * Scale: a single map-side-combinable aggregate — no joins at all. */
  def partialCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir).select(
      $"l_quantity".cast("long").as("x"),
      floor($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("long").as("y"),
      floor($"l_discount" * 100 + 0.5).cast("long").as("z"))
    val m = base.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"), sum($"z").as("sz"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"), sum($"z" * $"z").as("szz"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"z").as("sxz"), sum($"y" * $"z").as("syz"))
    def d(c: Column) = c.cast("double")
    def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      (d($"n") * d(sab) - d(sa) * d(sb)) /
        sqrt((d($"n") * d(saa) - d(sa) * d(sa)) * (d($"n") * d(sbb) - d(sb) * d(sb)))
    val rxy = r($"sxy", $"sx", $"sy", $"sxx", $"syy")
    val rxz = r($"sxz", $"sx", $"sz", $"sxx", $"szz")
    val ryz = r($"syz", $"sy", $"sz", $"syy", $"szz")
    val partial = (rxy - rxz * ryz) / sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    m.select($"n", $"sx", $"sy", $"sz", $"sxy", $"sxz", $"syz",
      QueryUtil.halfUp4(rxy).as("r_xy"), QueryUtil.halfUp4(rxz).as("r_xz"),
      QueryUtil.halfUp4(ryz).as("r_yz"), QueryUtil.halfUp4(partial).as("r_xy_z"))
  }

  private val partialCorrOracle = {
    def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      s"""(CAST(n AS DOUBLE) * CAST($sab AS DOUBLE) - CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE))
         | / sqrt((CAST(n AS DOUBLE) * CAST($saa AS DOUBLE) - CAST($sa AS DOUBLE) * CAST($sa AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * CAST($sbb AS DOUBLE) - CAST($sb AS DOUBLE) * CAST($sb AS DOUBLE)))""".stripMargin
    s"""WITH base AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS x,
       |         CAST(floor(l_extendedprice * (1.0 - l_discount)) AS BIGINT) AS y,
       |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(z) AS BIGINT) AS sz,
       |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(z * z) AS BIGINT) AS szz,
       |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
       |         CAST(sum(y * z) AS BIGINT) AS syz
       |  FROM base),
       |rr AS (
       |  SELECT *,
       |         ${r("sxy", "sx", "sy", "sxx", "syy")} AS rxy,
       |         ${r("sxz", "sx", "sz", "sxx", "szz")} AS rxz,
       |         ${r("syz", "sy", "sz", "syy", "szz")} AS ryz
       |  FROM m)
       |SELECT n, sx, sy, sz, sxy, sxz, syz,
       |       floor(rxy * 10000 + 0.5) / 10000.0 AS r_xy,
       |       floor(rxz * 10000 + 0.5) / 10000.0 AS r_xz,
       |       floor(ryz * 10000 + 0.5) / 10000.0 AS r_yz,
       |       floor((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
       |             * 10000 + 0.5) / 10000.0 AS r_xy_z
       |FROM rr""".stripMargin
  }

  // ---------------------------------------------------------------- x358

  /** x358: Nelson–Aalen cumulative hazard over the x346 survival frame
    * (user observation spans in minutes, purchase = event) — H(t) =
    * Σ_{tᵢ ≤ t} dᵢ/nᵢ with dᵢ = events at tᵢ and nᵢ = subjects still at
    * risk. Each increment dᵢ·10⁶ DIV nᵢ is micro-quantized BEFORE the
    * cumulative sum (truncating, so both engines walk the identical
    * integer trajectory); the at-risk counts come from a descending
    * cumulative over the span census — no joins. The counting-process
    * twin of x197's Kaplan–Meier product-limit.
    *
    * Scale: one groupBy(user) pass, one census over distinct spans,
    * two window sums. */
  def nelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subj = Round13Queries16.survivalSubjects(spark, dir)
      .select($"t_min", $"e")
    val census = subj.groupBy($"t_min")
      .agg(count(lit(1)).as("n_at"), sum($"e").as("d_ev"))
    val wRisk = Window.orderBy($"t_min")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy($"t_min").rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("n_risk", sum($"n_at").over(wRisk))
      .withColumn("h_inc", expr("(d_ev * 1000000) DIV n_risk"))
      .withColumn("h_cum", sum($"h_inc").over(wCum))
      .filter($"d_ev" > 0L)
      .select($"t_min", $"d_ev", $"n_risk", $"h_inc", $"h_cum")
      .orderBy($"t_min")
  }

  private val nelsonAalenOracle =
    s"""WITH subj AS MATERIALIZED (
      |  SELECT t_min, e FROM (${Round13Queries16.survivalSubjectsSql})),
      |census AS (
      |  SELECT t_min, CAST(count(*) AS BIGINT) AS n_at, CAST(sum(e) AS BIGINT) AS d_ev
      |  FROM subj GROUP BY 1),
      |risk AS (
      |  SELECT *,
      |         CAST(sum(n_at) OVER (ORDER BY t_min
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM census),
      |inc AS (
      |  SELECT *, (d_ev * 1000000) // n_risk AS h_inc FROM risk),
      |cum AS (
      |  SELECT *, CAST(sum(h_inc) OVER (ORDER BY t_min
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h_cum FROM inc)
      |SELECT t_min, d_ev, n_risk, h_inc, h_cum
      |FROM cum WHERE d_ev > 0
      |ORDER BY t_min""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x356_moods_median",
      "Mood's median test: global doubled median off the value census, 2x3 dichotomy chi-square from BIGINT cells",
      moodsMedian, Some(moodsMedianOracle)),
    QueryDef("x357_partial_corr",
      "partial correlation r_xy.z from the exact BIGINT moment census: revenue-quantity association controlling for discount",
      partialCorr, Some(partialCorrOracle)),
    QueryDef("x358_nelson_aalen",
      "Nelson-Aalen cumulative hazard: micro-quantized d/n increments over the span census, Kaplan-Meier's counting-process twin",
      nelsonAalen, Some(nelsonAalenOracle)))
}
