package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fifty-eighth tier: multiple regression as an aggregate
  * (x235) — 3-feature OLS (intercept, linear trend, weekend dummy) on
  * daily revenue, solved in closed form by Cramer's rule over exact
  * integer moments, the multi-feature upgrade of q70's per-group
  * simple OLS. */
object Round10Queries58 {

  /** 3×3 determinant over CAST(entry AS DOUBLE) — ONE string spliced
    * into both engines (expansion by the first row, fixed
    * association). */
  private def det3(m: Array[Array[String]]): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    def minor(a: String, b: String, c: String, e: String) =
      s"(${d(a)} * ${d(b)} - ${d(c)} * ${d(e)})"
    s"(${d(m(0)(0))} * ${minor(m(1)(1), m(2)(2), m(1)(2), m(2)(1))}" +
      s" - ${d(m(0)(1))} * ${minor(m(1)(0), m(2)(2), m(1)(2), m(2)(0))}" +
      s" + ${d(m(0)(2))} * ${minor(m(1)(0), m(2)(1), m(1)(1), m(2)(0))})"
  }

  private val X = Array(
    Array("n", "sd", "sw"),
    Array("sd", "sdd", "sdw"),
    Array("sw", "sdw", "sww"))
  private def replaceCol(col: Int, rhs: Array[String]) =
    X.zipWithIndex.map { case (row, i) =>
      row.zipWithIndex.map { case (v, j) => if (j == col) rhs(i) else v } }
  private val Rhs = Array("sy", "sdy", "swy")

  /** x235: OLS y = β₀ + β₁·di + β₂·weekend over the ≤-1997 daily
    * revenue series. The normal-equation matrix entries are exact
    * integer sums (whole dollars; the weekend dummy is the x218 slot
    * convention, so no engine-divergent calendar call); Cramer's rule
    * expands the four 3×3 determinants in ONE shared string per
    * determinant — double products of exact integers in a fixed
    * association — and each β quantizes once at the end. R² comes
    * from the fitted-value moments, all still closed-form.
    *
    * Scale: one date-grain aggregate and one 8-moment reduction —
    * the fit never materializes anything data-sized; adding features
    * grows the moment vector quadratically, not the data passes. */
  def olsMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") <= 1997)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
      .select($"di", $"y",
        when(pmod($"di", lit(7L)) >= 5L, 1L).otherwise(0L).as("w"))
    val m = daily.agg(
      count(lit(1)).as("n"), sum($"di").as("sd"), sum($"w").as("sw"),
      sum($"di" * $"di").as("sdd"), sum($"di" * $"w").as("sdw"),
      sum($"w" * $"w").as("sww"), sum($"y").as("sy"),
      sum($"di" * $"y").as("sdy"), sum($"w" * $"y").as("swy"),
      sum($"y" * $"y").as("syy"))
    val det = det3(X)
    val d0 = det3(replaceCol(0, Rhs))
    val d1 = det3(replaceCol(1, Rhs))
    val d2 = det3(replaceCol(2, Rhs))
    // R² = 1 − SSE/SST with SSE = syy − β₀sy − β₁sdy − β₂swy (the
    // normal-equation identity), every β the unquantized double ratio.
    val sse = s"(CAST(syy AS DOUBLE) - ($d0 / $det) * CAST(sy AS DOUBLE)" +
      s" - ($d1 / $det) * CAST(sdy AS DOUBLE)" +
      s" - ($d2 / $det) * CAST(swy AS DOUBLE))"
    val sst = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)" +
      " / CAST(n AS DOUBLE))"
    m.select($"n",
      expr(s"CAST(floor($d0 / $det * 100 + 0.5) AS BIGINT)").as("b0_d100"),
      expr(s"CAST(floor($d1 / $det * 10000 + 0.5) AS BIGINT)").as("b1_d10000"),
      expr(s"CAST(floor($d2 / $det * 100 + 0.5) AS BIGINT)").as("b2_d100"),
      expr(s"CAST(floor((1.0 - $sse / $sst) * 1000000 + 0.5) AS BIGINT)")
        .as("r2_fp"))
  }

  private val olsOracle = {
    val det = det3(X)
    val d0 = det3(replaceCol(0, Rhs))
    val d1 = det3(replaceCol(1, Rhs))
    val d2 = det3(replaceCol(2, Rhs))
    val sse = s"(CAST(syy AS DOUBLE) - ($d0 / $det) * CAST(sy AS DOUBLE)" +
      s" - ($d1 / $det) * CAST(sdy AS DOUBLE)" +
      s" - ($d2 / $det) * CAST(swy AS DOUBLE))"
    val sst = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)" +
      " / CAST(n AS DOUBLE))"
    s"""WITH daily AS (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders WHERE year(o_orderdate) <= 1997 GROUP BY 1),
       |f AS (SELECT di, y, CASE WHEN ((di % 7) + 7) % 7 >= 5 THEN 1 ELSE 0 END AS w
       |      FROM daily),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(di) AS BIGINT) AS sd,
       |         CAST(sum(w) AS BIGINT) AS sw, CAST(sum(di * di) AS BIGINT) AS sdd,
       |         CAST(sum(di * w) AS BIGINT) AS sdw,
       |         CAST(sum(w * w) AS BIGINT) AS sww, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(di * y) AS BIGINT) AS sdy,
       |         CAST(sum(w * y) AS BIGINT) AS swy,
       |         CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM f)
       |SELECT n,
       |       CAST(floor($d0 / $det * 100 + 0.5) AS BIGINT) AS b0_d100,
       |       CAST(floor($d1 / $det * 10000 + 0.5) AS BIGINT) AS b1_d10000,
       |       CAST(floor($d2 / $det * 100 + 0.5) AS BIGINT) AS b2_d100,
       |       CAST(floor((1.0 - $sse / $sst) * 1000000 + 0.5) AS BIGINT) AS r2_fp
       |FROM m""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x235_ols_multi",
      "3-feature OLS (intercept, trend, weekend dummy) by Cramer's rule on exact integer moments; engine-shared determinant strings",
      olsMulti, Some(olsOracle)))
}
