package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 fifty-seventh tier: forecast-quantile evaluation (x233,
  * pinball loss) and classic rank agreement (x234, Kendall τ-b) —
  * rounding out q110/x206's point-forecast backtests and x202's
  * top-weighted RBO. */
object Round10Queries57 {

  /** Evaluated quantiles (per mille). */
  private val PinballTaus = Seq(100L, 500L, 900L)

  // ---------------------------------------------------------------- x233

  /** x233: pinball (quantile) loss — the proper scoring rule for
    * quantile forecasts: predict the τ-quantile of daily revenue from
    * the train years' EXACT rank-based quantile (the q72 recipe), then
    * score every 1998 day with
    * L_τ(y,q) = max(τ·(y−q), (τ−1)·(y−q)). With y, q in whole dollars
    * and τ in per-mille, every loss term is an exact integer — a
    * correctly calibrated τ=0.9 forecast must undershoot on ~10% of
    * days, and the published panel (per τ: total loss, coverage) makes
    * that checkable.
    *
    * Scale: one date-grain aggregate; the train quantile is a rank
    * selection; scoring is a broadcast of 3 scalars over the holdout
    * frame. */
  def pinball(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"), year($"o_orderdate").as("yr"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
      .localCheckpoint(true)
    val train = daily.filter($"yr" <= 1997)
    val nT = train.agg(count(lit(1)).as("n"))
    val ranked = train.withColumn("rk",
      row_number().over(Window.orderBy($"y", $"di")).cast("long"))
    val taus = PinballTaus.toDF("tau_pm")
    // Exact lower quantile: the ceil(τ·n/1000)-th order statistic.
    val qs = ranked.crossJoin(broadcast(nT)).crossJoin(broadcast(taus))
      .filter($"rk" === expr("greatest(1, (tau_pm * n + 999) div 1000)"))
      .select($"tau_pm", $"y".as("q"))
      .localCheckpoint(true)
    daily.filter($"yr" === 1998)
      .crossJoin(broadcast(qs))
      .select($"tau_pm", $"y", $"q",
        expr("greatest(tau_pm * (y - q), (tau_pm - 1000) * (y - q))")
          .as("loss_pm"),
        when($"y" <= $"q", 1L).otherwise(0L).as("covered"))
      .groupBy($"tau_pm")
      .agg(count(lit(1)).as("n_days"), max($"q").as("q_dollars"),
        sum($"loss_pm").as("loss_pm"),
        expr("CAST((sum(covered) * 1000000) div count(1) AS BIGINT)")
          .as("coverage_fp"))
      .orderBy($"tau_pm")
  }

  private val pinballOracle =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         year(o_orderdate) AS yr,
       |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders GROUP BY 1, 2),
       |train AS (SELECT di, y FROM daily WHERE yr <= 1997),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
       |ranked AS (SELECT y, CAST(row_number() OVER (ORDER BY y, di) AS BIGINT)
       |             AS rk FROM train),
       |taus AS (SELECT CAST(unnest([${PinballTaus.mkString(", ")}]) AS BIGINT)
       |           AS tau_pm),
       |qs AS MATERIALIZED (
       |  SELECT t.tau_pm, r.y AS q
       |  FROM ranked r, nt, taus t
       |  WHERE r.rk = greatest(1, (t.tau_pm * nt.n + 999) // 1000)),
       |scored AS (
       |  SELECT q.tau_pm, d.y, q.q,
       |         greatest(q.tau_pm * (d.y - q.q), (q.tau_pm - 1000) * (d.y - q.q))
       |           AS loss_pm,
       |         CASE WHEN d.y <= q.q THEN 1 ELSE 0 END AS covered
       |  FROM daily d CROSS JOIN qs q WHERE d.yr = 1998)
       |SELECT tau_pm, CAST(count(*) AS BIGINT) AS n_days,
       |       CAST(max(q) AS BIGINT) AS q_dollars,
       |       CAST(sum(loss_pm) AS BIGINT) AS loss_pm,
       |       CAST((sum(covered) * 1000000) // count(*) AS BIGINT) AS coverage_fp
       |FROM scored GROUP BY tau_pm
       |ORDER BY tau_pm""".stripMargin

  // ---------------------------------------------------------------- x234

  /** Compared top-N parts (bounds the O(N²) concordance join). */
  private val TauTop = 100

  /** x234: Kendall τ-b between the 1995 and 1996 part-revenue rankings
    * — the classic concordance statistic beside x202's top-weighted
    * RBO: over the parts ranked in BOTH years (top-[[TauTop]] of
    * 1995 by revenue), count concordant/discordant pairs and
    * τ-b = (C−D)/√((C+D+Tx)(C+D+Ty)). Ranks are exact integers with
    * key tie-breaks, the pair table is the bounded N² self-join (the
    * q77 Spearman discipline), and the one sqrt is IEEE-stable.
    *
    * Scale: two filtered part-grain aggregates; the pair join is
    * capped at TauTop² rows whatever the corpus. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def rev(yr: Int) = Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === yr)
      .groupBy($"l_partkey".as("pk"))
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") + 0.5)
        .cast("long")).as("r"))
    val a = rev(1995).withColumn("ra",
      row_number().over(Window.orderBy($"r".desc, $"pk")).cast("long"))
      .filter($"ra" <= TauTop).select($"pk", $"ra")
    val b = rev(1996).select($"pk", $"r".as("rb0"))
    val both = a.join(b, Seq("pk"), "left").na.fill(0L, Seq("rb0"))
      .withColumn("rb", row_number().over(
        Window.orderBy($"rb0".desc, $"pk")).cast("long"))
      .select($"pk", $"ra", $"rb")
      .localCheckpoint(true)
    val pairs = both.toDF("p1", "a1", "b1")
      .join(both.toDF("p2", "a2", "b2"), $"p1" < $"p2")
      .select(
        when(($"a1" < $"a2" && $"b1" < $"b2") ||
          ($"a1" > $"a2" && $"b1" > $"b2"), 1L).otherwise(0L).as("c"),
        when(($"a1" < $"a2" && $"b1" > $"b2") ||
          ($"a1" > $"a2" && $"b1" < $"b2"), 1L).otherwise(0L).as("d"))
    pairs.agg(sum($"c").as("nc"), sum($"d").as("nd"))
      .select($"nc", $"nd",
        expr("CAST(floor(CAST(nc - nd AS DOUBLE)" +
          " / sqrt(CAST(nc + nd AS DOUBLE) * CAST(nc + nd AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("tau_fp"))
  }

  private val kendallOracle =
    s"""WITH ra AS (
       |  SELECT pk, CAST(row_number() OVER (ORDER BY r DESC, pk) AS BIGINT) AS ra
       |  FROM (SELECT l_partkey AS pk,
       |          CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5)
       |            AS BIGINT)) AS BIGINT) AS r
       |        FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1) t),
       |a AS (SELECT pk, ra FROM ra WHERE ra <= $TauTop),
       |b AS (SELECT l_partkey AS pk,
       |        CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5)
       |          AS BIGINT)) AS BIGINT) AS rb0
       |      FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
       |both0 AS MATERIALIZED (
       |  SELECT a.pk, a.ra,
       |         CAST(row_number() OVER (ORDER BY COALESCE(b.rb0, 0) DESC, a.pk)
       |              AS BIGINT) AS rb
       |  FROM a LEFT JOIN b ON b.pk = a.pk),
       |pairs AS (
       |  SELECT CASE WHEN (x.ra < y.ra AND x.rb < y.rb)
       |                OR (x.ra > y.ra AND x.rb > y.rb) THEN 1 ELSE 0 END AS c,
       |         CASE WHEN (x.ra < y.ra AND x.rb > y.rb)
       |                OR (x.ra > y.ra AND x.rb < y.rb) THEN 1 ELSE 0 END AS d
       |  FROM both0 x JOIN both0 y ON x.pk < y.pk)
       |SELECT CAST(sum(c) AS BIGINT) AS nc, CAST(sum(d) AS BIGINT) AS nd,
       |       CAST(floor(CAST(sum(c) - sum(d) AS DOUBLE)
       |         / sqrt(CAST(sum(c) + sum(d) AS DOUBLE)
       |                * CAST(sum(c) + sum(d) AS DOUBLE))
       |         * 1000000 + 0.5) AS BIGINT) AS tau_fp
       |FROM pairs""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x233_pinball",
      "pinball loss of exact train quantiles (tau 0.1/0.5/0.9) on the 1998 holdout: integer per-mille losses plus coverage",
      pinball, Some(pinballOracle)),
    QueryDef("x234_kendall_tau",
      "Kendall tau-b between 1995/1996 part-revenue rankings over the 1995 top-100: bounded pair join, exact concordance counts",
      kendallTau, Some(kendallOracle)))
}
