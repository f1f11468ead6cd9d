package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 ninth tier: two residual-shaped diagnostics that round out
  * the inference battery — Brown–Forsythe (the robust Levene variant:
  * variance homogeneity via absolute deviations from the group MEDIAN)
  * and Durbin–Watson (first-order serial correlation of regression
  * residuals). Contract as ever: group medians, deviation sums and
  * residuals are exact integers (doubled medians for half-integer
  * middles, micro-quantized residuals via truncating division with
  * DECIMAL(38)/HUGEINT intermediates — the x330 overflow rule), and the
  * F/DW statistic is one identical double projection.
  */
object Round13Queries9 {

  /** χ²(2, 0.05)/2 — the large-sample F(2, ∞) critical value; the sig
    * flag is documented as the asymptotic approximation. */
  private val FCrit2Inf = 2.9957323735

  // ---------------------------------------------------------------- x333

  /** x333: Brown–Forsythe test — do the three return flags have equal
    * quantity SPREAD (not location)? z_ij = |x_ij − median_g| with the
    * group median taken off the 50-value census as a DOUBLED median
    * (lo-rank + hi-rank value, so half-integer medians stay integer);
    * z2 = |2v − m2_g| is then BIGINT per census row, and the one-way
    * ANOVA F over z is computed from the per-group (n, Σz2, Σz2²)
    * census sums — between = ΣS_g²/n_g − (ΣS)²/N, within = ΣQ − ΣS_g²/n_g,
    * F = (between/2)/(within/(N−3)) — as one double projection (the
    * doubling cancels in the ratio). sig compares F against the
    * F(2, ∞) = χ²₂/2 asymptote, engine-deterministic on identical
    * doubles.
    *
    * Scale: the only corpus pass is the map-side-combinable value
    * census; medians, deviations and the F arithmetic run on ≤ 50 rows
    * (broadcast cross joins of one-row scalar frames). */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("v"), $"l_returnflag".as("g"))
      .groupBy($"v")
      .agg(sum(when($"g" === "A", 1L).otherwise(0L)).as("ca"),
        sum(when($"g" === "N", 1L).otherwise(0L)).as("cn"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("cr"))
    val w = Window.orderBy($"v").rowsBetween(Long.MinValue, 0)
    val cum = census
      .withColumn("cuma", sum($"ca").over(w))
      .withColumn("cumn", sum($"cn").over(w))
      .withColumn("cumr", sum($"cr").over(w))
    val tot = census.agg(sum($"ca").as("na"), sum($"cn").as("nn"), sum($"cr").as("nr"))
    def m2(cumc: String, nc: String) =
      (min(when(col(cumc) >= expr(s"($nc + 1) DIV 2"), $"v")) +
        min(when(col(cumc) >= expr(s"($nc + 2) DIV 2"), $"v")))
    val med = cum.crossJoin(broadcast(tot)).agg(
      first($"na").as("na"), first($"nn").as("nn"), first($"nr").as("nr"),
      m2("cuma", "na").as("m2a"), m2("cumn", "nn").as("m2n"), m2("cumr", "nr").as("m2r"))
    val dev = census.crossJoin(broadcast(med))
      .select($"na", $"nn", $"nr",
        $"m2a", $"m2n", $"m2r",
        ($"ca" * abs(lit(2L) * $"v" - $"m2a")).as("za"),
        ($"cn" * abs(lit(2L) * $"v" - $"m2n")).as("zn"),
        ($"cr" * abs(lit(2L) * $"v" - $"m2r")).as("zr"),
        ($"ca" * abs(lit(2L) * $"v" - $"m2a") * abs(lit(2L) * $"v" - $"m2a")).as("qa"),
        ($"cn" * abs(lit(2L) * $"v" - $"m2n") * abs(lit(2L) * $"v" - $"m2n")).as("qn"),
        ($"cr" * abs(lit(2L) * $"v" - $"m2r") * abs(lit(2L) * $"v" - $"m2r")).as("qr"))
    val agg = dev.groupBy($"na", $"nn", $"nr", $"m2a", $"m2n", $"m2r").agg(
      sum($"za").as("sa"), sum($"zn").as("sn"), sum($"zr").as("sr"),
      sum($"qa").as("q_a"), sum($"qn").as("q_n"), sum($"qr").as("q_r"))
    def d(c: Column) = c.cast("double")
    val n = d($"na") + d($"nn") + d($"nr")
    val ssg = d($"sa") * d($"sa") / d($"na") + d($"sn") * d($"sn") / d($"nn") +
      d($"sr") * d($"sr") / d($"nr")
    val stot = d($"sa") + d($"sn") + d($"sr")
    val between = ssg - stot * stot / n
    val within = d($"q_a") + d($"q_n") + d($"q_r") - ssg
    val fUnc = (between / lit(2.0)) / (within / (n - lit(3.0)))
    agg.select($"na", $"nn", $"nr", $"m2a", $"m2n", $"m2r",
      $"sa", $"sn", $"sr", $"q_a", $"q_n", $"q_r",
      QueryUtil.halfUp4(fUnc).as("f_stat"),
      when(fUnc > FCrit2Inf, 1L).otherwise(0L).as("sig"))
  }

  private val brownForsytheOracle =
    s"""WITH census AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS v,
       |         CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
       |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
       |  FROM lineitem GROUP BY 1),
       |cum AS (
       |  SELECT *,
       |         sum(ca) OVER (ORDER BY v) AS cuma,
       |         sum(cn) OVER (ORDER BY v) AS cumn,
       |         sum(cr) OVER (ORDER BY v) AS cumr
       |  FROM census),
       |tot AS (SELECT sum(ca) AS na, sum(cn) AS nn, sum(cr) AS nr FROM census),
       |med AS (
       |  SELECT CAST(any_value(na) AS BIGINT) AS na,
       |         CAST(any_value(nn) AS BIGINT) AS nn,
       |         CAST(any_value(nr) AS BIGINT) AS nr,
       |         CAST(min(CASE WHEN cuma >= (na + 1) // 2 THEN v END)
       |            + min(CASE WHEN cuma >= (na + 2) // 2 THEN v END) AS BIGINT) AS m2a,
       |         CAST(min(CASE WHEN cumn >= (nn + 1) // 2 THEN v END)
       |            + min(CASE WHEN cumn >= (nn + 2) // 2 THEN v END) AS BIGINT) AS m2n,
       |         CAST(min(CASE WHEN cumr >= (nr + 1) // 2 THEN v END)
       |            + min(CASE WHEN cumr >= (nr + 2) // 2 THEN v END) AS BIGINT) AS m2r
       |  FROM cum CROSS JOIN tot),
       |agg AS (
       |  SELECT na, nn, nr, m2a, m2n, m2r,
       |         CAST(sum(ca * abs(2 * v - m2a)) AS BIGINT) AS sa,
       |         CAST(sum(cn * abs(2 * v - m2n)) AS BIGINT) AS sn,
       |         CAST(sum(cr * abs(2 * v - m2r)) AS BIGINT) AS sr,
       |         CAST(sum(ca * abs(2 * v - m2a) * abs(2 * v - m2a)) AS BIGINT) AS q_a,
       |         CAST(sum(cn * abs(2 * v - m2n) * abs(2 * v - m2n)) AS BIGINT) AS q_n,
       |         CAST(sum(cr * abs(2 * v - m2r) * abs(2 * v - m2r)) AS BIGINT) AS q_r
       |  FROM census CROSS JOIN med
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |stat AS (
       |  SELECT *,
       |         ((CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
       |           + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(nn AS DOUBLE)
       |           + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)
       |           - (CAST(sa AS DOUBLE) + CAST(sn AS DOUBLE) + CAST(sr AS DOUBLE))
       |             * (CAST(sa AS DOUBLE) + CAST(sn AS DOUBLE) + CAST(sr AS DOUBLE))
       |             / (CAST(na AS DOUBLE) + CAST(nn AS DOUBLE) + CAST(nr AS DOUBLE))) / 2.0)
       |         / ((CAST(q_a AS DOUBLE) + CAST(q_n AS DOUBLE) + CAST(q_r AS DOUBLE)
       |             - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
       |                + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(nn AS DOUBLE)
       |                + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
       |            / (CAST(na AS DOUBLE) + CAST(nn AS DOUBLE) + CAST(nr AS DOUBLE) - 3.0)) AS f_raw
       |  FROM agg)
       |SELECT na, nn, nr, m2a, m2n, m2r, sa, sn, sr, q_a, q_n, q_r,
       |       floor(f_raw * 10000 + 0.5) / 10000.0 AS f_stat,
       |       CAST(CASE WHEN f_raw > $FCrit2Inf THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM stat""".stripMargin

  // ---------------------------------------------------------------- x334

  /** Residual quantization scale (milli-units) — small enough that
    * Σe² stays in BIGINT at GenScale-sf1 weekly volumes, large enough
    * that the DW ratio carries ~3 significant digits of residual. */
  private val DwScale = 1000L

  /** x334: Durbin–Watson — are the residuals of the weekly-order-volume
    * trend line serially correlated (the classic autocorrelation
    * diagnostic for regression on time)? Weeks are epoch-day DIV 7
    * buckets (timezone-free in both engines), x = the dense week index,
    * y = the weekly order count. The OLS residual is kept EXACT as the
    * integer numerator Rᵢ = nD·yᵢ − D·Σy + B·Σx − n·B·xᵢ over the common
    * denominator nD (D = nΣx²−(Σx)², B = nΣxy−ΣxΣy), then quantized to
    * milli-units with truncating division — products run in
    * DECIMAL(38)/HUGEINT (the x330 silent-BIGINT-overflow rule) even
    * though current scales fit, because a 100× corpus would not.
    * DW = Σ(eᵢ−eᵢ₋₁)²/Σeᵢ² from BIGINT sums; DW ≈ 2 means no serial
    * correlation, < 1.5 flags positive autocorrelation.
    *
    * Scale: one groupBy(week) corpus pass; the regression scalars and
    * the DW window run on the ~350-row weekly frame. */
  def durbinWatson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekly = Tables.orders(spark, dir)
      .select(expr("datediff(to_date(o_orderdate), DATE '1970-01-01') DIV 7").as("wk"))
      .groupBy($"wk").agg(count(lit(1)).as("y"))
      .withColumn("x", row_number().over(Window.orderBy($"wk")).cast("long"))
    val scal = weekly.agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
      sum($"y").as("sy"), sum($"x" * $"y").as("sxy"))
      .withColumn("dd", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("bn", $"n" * $"sxy" - $"sx" * $"sy")
    val resid = weekly.crossJoin(broadcast(scal))
      .withColumn("e_m", expr(
        s"""CAST(((CAST(n AS DECIMAL(38,0)) * CAST(dd AS DECIMAL(38,0)) * y
           |  - CAST(dd AS DECIMAL(38,0)) * sy
           |  + CAST(bn AS DECIMAL(38,0)) * sx
           |  - CAST(n AS DECIMAL(38,0)) * CAST(bn AS DECIMAL(38,0)) * x) * $DwScale)
           | DIV (CAST(n AS DECIMAL(38,0)) * CAST(dd AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .withColumn("e_prev", lag($"e_m", 1).over(Window.orderBy($"x")))
    val agg = resid.groupBy($"n", $"dd", $"bn").agg(
      sum($"e_m" * $"e_m").as("se2"),
      sum(when($"e_prev".isNotNull,
        ($"e_m" - $"e_prev") * ($"e_m" - $"e_prev")).otherwise(0L)).as("sd2"))
    val dw = $"sd2".cast("double") / $"se2".cast("double")
    agg.select($"n", $"dd", $"bn", $"se2", $"sd2",
      QueryUtil.halfUp4(dw).as("dw"),
      when(dw < 1.5, 1L).otherwise(0L).as("pos_autocorr"))
  }

  private val durbinWatsonOracle =
    s"""WITH weekly AS MATERIALIZED (
       |  SELECT wk, y, CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS x
       |  FROM (
       |    SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7 AS wk,
       |           CAST(count(*) AS BIGINT) AS y
       |    FROM orders GROUP BY 1)),
       |scal AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM weekly),
       |scal2 AS (
       |  SELECT *, n * sxx - sx * sx AS dd, n * sxy - sx * sy AS bn FROM scal),
       |resid AS (
       |  SELECT n, dd, bn, x,
       |         CAST(((CAST(n AS HUGEINT) * CAST(dd AS HUGEINT) * y
       |                - CAST(dd AS HUGEINT) * sy
       |                + CAST(bn AS HUGEINT) * sx
       |                - CAST(n AS HUGEINT) * CAST(bn AS HUGEINT) * x) * $DwScale)
       |              // (CAST(n AS HUGEINT) * CAST(dd AS HUGEINT)) AS BIGINT) AS e_m
       |  FROM weekly CROSS JOIN scal2),
       |lagged AS (
       |  SELECT *, lag(e_m) OVER (ORDER BY x) AS e_prev FROM resid),
       |agg AS (
       |  SELECT n, dd, bn,
       |         CAST(sum(e_m * e_m) AS BIGINT) AS se2,
       |         CAST(sum(CASE WHEN e_prev IS NOT NULL
       |                       THEN (e_m - e_prev) * (e_m - e_prev) ELSE 0 END) AS BIGINT) AS sd2
       |  FROM lagged GROUP BY 1, 2, 3)
       |SELECT n, dd, bn, se2, sd2,
       |       floor(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS dw,
       |       CAST(CASE WHEN CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE) < 1.5
       |                 THEN 1 ELSE 0 END AS BIGINT) AS pos_autocorr
       |FROM agg""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x333_brown_forsythe",
      "Brown-Forsythe variance-homogeneity test: doubled group medians off the value census, ANOVA-F on BIGINT deviation sums",
      brownForsythe, Some(brownForsytheOracle)),
    QueryDef("x334_durbin_watson",
      "Durbin-Watson serial-correlation diagnostic on the weekly-volume trend: exact integer residual numerators, milli-quantized",
      durbinWatson, Some(durbinWatsonOracle)))
}
