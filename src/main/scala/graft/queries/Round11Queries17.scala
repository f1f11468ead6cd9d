package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 seventeenth tier: difference-in-differences — the third leg
  * of the observational-causal family (x267 DETECTS confounding, x269
  * ADJUSTS a point comparison, DiD identifies an effect from PANEL
  * structure: treated-vs-control change across a policy date, with the
  * common-trend assumption falsified-or-not by a placebo split inside
  * the pre period). All cells are exact integer (n, urgent) pairs;
  * rates and the DiD contrast are doubles both engines derive from
  * identical integers.
  */
object Round11Queries17 {

  /** Policy date and the placebo date inside the pre period. */
  private val PolicyYear = 1998
  private val PlaceboYear = 1996

  // ---------------------------------------------------------------- x283

  /** x283: difference-in-differences on the urgent-order rate —
    * "treated" = AUTOMOBILE customers, control = BUILDING, policy at
    * [[PolicyYear]]-01-01: `DiD = (r_T,post − r_T,pre) − (r_C,post −
    * r_C,pre)`. Emitted with all eight exact cell integers, plus the
    * PLACEBO DiD computed the same way at [[PlaceboYear]] entirely
    * inside the pre period — a large placebo effect would falsify the
    * common-trend assumption that gives DiD its causal reading; the
    * audit travels with the estimate.
    *
    * Scale: one broadcast dim join + one 4-cell (8 with placebo)
    * aggregation — the identification strategy costs nothing beyond
    * the scan. */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .select(($"c_mktsegment" === "AUTOMOBILE").as("treated"),
        year($"o_orderdate").as("yr"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("u"))
      .localCheckpoint(true)
    def cells(split: Int, pre: Column => Column): DataFrame = {
      def cell(t: Boolean, post: Boolean, col: String): Column = {
        val inPeriod = if (post) !pre($"yr") else pre($"yr")
        sum(when($"treated" === t && inPeriod,
          if (col == "n") lit(1L) else $"u").otherwise(0L)).as(col + suffix(t, post, split))
      }
      base.agg(
        cell(t = true, post = false, "n"), cell(t = true, post = false, "u"),
        cell(t = true, post = true, "n"), cell(t = true, post = true, "u"),
        cell(t = false, post = false, "n"), cell(t = false, post = false, "u"),
        cell(t = false, post = true, "n"), cell(t = false, post = true, "u"))
    }
    def suffix(t: Boolean, post: Boolean, split: Int): String =
      (if (t) "_t" else "_c") + (if (post) "_post" else "_pre") +
        (if (split == PolicyYear) "" else "_pl")
    // explicit NULL on an empty cell (ANSI div-by-zero would throw; a
    // missing period should poison the contrast to NULL, not crash)
    def rate(n: Column, u: Column): Column =
      when(n =!= 0L, u.cast("double") / n.cast("double"))
    def did(p: String): Column =
      (rate(col("n_t_post" + p), col("u_t_post" + p))
        - rate(col("n_t_pre" + p), col("u_t_pre" + p))) -
        (rate(col("n_c_post" + p), col("u_c_post" + p))
          - rate(col("n_c_pre" + p), col("u_c_pre" + p)))
    val main = cells(PolicyYear, y => y < PolicyYear)
    val placebo = base.filter($"yr" < PolicyYear)
      .agg(
        sum(when($"treated" && $"yr" < PlaceboYear, 1L).otherwise(0L)).as("n_t_pre_pl"),
        sum(when($"treated" && $"yr" < PlaceboYear, $"u").otherwise(0L)).as("u_t_pre_pl"),
        sum(when($"treated" && $"yr" >= PlaceboYear, 1L).otherwise(0L)).as("n_t_post_pl"),
        sum(when($"treated" && $"yr" >= PlaceboYear, $"u").otherwise(0L)).as("u_t_post_pl"),
        sum(when(!$"treated" && $"yr" < PlaceboYear, 1L).otherwise(0L)).as("n_c_pre_pl"),
        sum(when(!$"treated" && $"yr" < PlaceboYear, $"u").otherwise(0L)).as("u_c_pre_pl"),
        sum(when(!$"treated" && $"yr" >= PlaceboYear, 1L).otherwise(0L)).as("n_c_post_pl"),
        sum(when(!$"treated" && $"yr" >= PlaceboYear, $"u").otherwise(0L)).as("u_c_post_pl"))
    main.crossJoin(broadcast(placebo))
      .select(
        $"n_t_pre", $"u_t_pre", $"n_t_post", $"u_t_post",
        $"n_c_pre", $"u_c_pre", $"n_c_post", $"u_c_post",
        QueryUtil.halfUp(did(""), 6).as("did"),
        QueryUtil.halfUp(did("_pl"), 6).as("placebo_did"))
  }

  private val diffInDiffOracle = {
    def cellSql(t: String, cond: String, name: String): String =
      s"""CAST(sum(CASE WHEN treated = $t AND $cond THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_$name,
         |CAST(sum(CASE WHEN treated = $t AND $cond THEN u ELSE 0 END) AS BIGINT)
         |  AS u_$name""".stripMargin
    def rate(p: String): String =
      s"CASE WHEN n_$p <> 0 THEN CAST(u_$p AS DOUBLE) / CAST(n_$p AS DOUBLE) END"
    s"""WITH base AS MATERIALIZED (
       |  SELECT c_mktsegment = 'AUTOMOBILE' AS treated,
       |         year(o_orderdate) AS yr,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
       |cells AS (
       |  SELECT
       |    ${cellSql("true", s"yr < $PolicyYear", "t_pre")},
       |    ${cellSql("true", s"yr >= $PolicyYear", "t_post")},
       |    ${cellSql("false", s"yr < $PolicyYear", "c_pre")},
       |    ${cellSql("false", s"yr >= $PolicyYear", "c_post")},
       |    ${cellSql("true", s"yr < $PlaceboYear", "t_pre_pl")},
       |    ${cellSql("true", s"yr >= $PlaceboYear AND yr < $PolicyYear", "t_post_pl")},
       |    ${cellSql("false", s"yr < $PlaceboYear", "c_pre_pl")},
       |    ${cellSql("false", s"yr >= $PlaceboYear AND yr < $PolicyYear", "c_post_pl")}
       |  FROM base)
       |SELECT n_t_pre, u_t_pre, n_t_post, u_t_post,
       |       n_c_pre, u_c_pre, n_c_post, u_c_post,
       |       floor(((${rate("t_post")} - ${rate("t_pre")})
       |              - (${rate("c_post")} - ${rate("c_pre")}))
       |             * 1000000 + 0.5) / 1000000.0 AS did,
       |       floor(((${rate("t_post_pl")} - ${rate("t_pre_pl")})
       |              - (${rate("c_post_pl")} - ${rate("c_pre_pl")}))
       |             * 1000000 + 0.5) / 1000000.0 AS placebo_did
       |FROM cells""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x283_diff_in_diff",
      "difference-in-differences on urgent rates with an in-pre-period placebo falsification",
      diffInDiff, Some(diffInDiffOracle)))
}
