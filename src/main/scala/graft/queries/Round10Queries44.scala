package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-fourth tier: classical time-series structure —
  * moving-average seasonal decomposition (x218) and the lagged
  * cross-correlation function between two nations' revenue series
  * (x219). */
object Round10Queries44 {

  /** Centered moving-average half-width for the trend (±14 ⇒ 29-day). */
  private val TrendHalf = 14

  /** Weekly season length (slots are di % 7 on the integer day index —
    * Spark's dayofweek is 1-based Sunday-first while DuckDB's is
    * 0-based, so the calendar functions are an oracle trap). */
  private val Season = 7

  // ---------------------------------------------------------------- x218

  /** x218: seasonal decomposition (STL-lite) of daily revenue (whole dollars so squared-moment sums stay in int64 past sf1):
    * trend = centered 29-day moving average (integer div of integer
    * sums — the window never leaves int64), seasonal = per-weekday-slot
    * mean of the detrended series (floor-double division: detrended
    * values go negative, where Spark's `div` and DuckDB's `//` round
    * differently), residual = remainder. Publishes the 7 seasonal
    * effects plus the replicated variance decomposition — the share of
    * variance each component explains, from exact integer moments.
    *
    * Scale: one date-grain aggregate then three window/group passes
    * over the ~1.1k-day frame; the decomposition is
    * calendar-bounded, not data-bounded. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") <= 1997)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
      .localCheckpoint(true)
    val wT = Window.orderBy($"di").rowsBetween(-TrendHalf, TrendHalf)
    val trended = daily
      .select($"di", $"y", sum($"y").over(wT).as("tsum"),
        count(lit(1)).over(wT).as("tcnt"),
        pmod($"di", lit(Season.toLong)).as("slot"))
      .select($"di", $"y", $"slot",
        expr("CAST(floor(CAST(tsum AS DOUBLE) / CAST(tcnt AS DOUBLE))" +
          " AS BIGINT)").as("t"))
      .withColumn("d", $"y" - $"t")
    val base = trended.localCheckpoint(true)
    val seasonal = base.groupBy($"slot")
      .agg(count(lit(1)).as("n_days"), sum($"d").as("sd"))
      .select($"slot", $"n_days",
        expr("CAST(floor(CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE))" +
          " AS BIGINT)").as("s_fp"))
      .localCheckpoint(true)
    val withS = base.join(broadcast(seasonal.select($"slot", $"s_fp")), "slot")
      .select($"y", $"t", ($"d" - $"s_fp").as("r"), ($"t" + $"s_fp").as("fit"))
    val mom = withS.agg(count(lit(1)).as("n"),
      sum($"y").as("sy"), sum($"y" * $"y").as("syy"),
      sum($"r").as("sr"), sum($"r" * $"r").as("srr"))
    val panel = mom.select(
      expr("CAST(floor((1.0 - (CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)" +
        " - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)))" +
        " / (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)" +
        " - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))" +
        " * 1000000 + 0.5) AS BIGINT)").as("explained_fp"))
    seasonal.crossJoin(broadcast(panel))
      .select($"slot", $"n_days", $"s_fp", $"explained_fp")
      .orderBy($"slot")
  }

  private val seasonalOracle =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
       |              AS BIGINT) AS y
       |  FROM orders WHERE year(o_orderdate) <= 1997 GROUP BY 1),
       |trended AS MATERIALIZED (
       |  SELECT di, y, di % $Season AS slot,
       |         CAST(floor(CAST(sum(y) OVER w AS DOUBLE)
       |           / CAST(count(*) OVER w AS DOUBLE)) AS BIGINT) AS t
       |  FROM daily
       |  WINDOW w AS (ORDER BY di ROWS BETWEEN $TrendHalf PRECEDING
       |               AND $TrendHalf FOLLOWING)),
       |base AS MATERIALIZED (SELECT *, y - t AS d FROM trended),
       |seasonal AS MATERIALIZED (
       |  SELECT slot, CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(floor(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |              AS BIGINT) AS s_fp
       |  FROM base GROUP BY slot),
       |with_s AS (
       |  SELECT b.y, b.t, b.d - s.s_fp AS r
       |  FROM base b JOIN seasonal s ON s.slot = b.slot),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(r) AS BIGINT) AS sr,
       |         CAST(sum(r * r) AS BIGINT) AS srr
       |  FROM with_s),
       |panel AS (
       |  SELECT CAST(floor((1.0 - (CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)
       |           - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)))
       |           / (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
       |           - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
       |           * 1000000 + 0.5) AS BIGINT) AS explained_fp
       |  FROM mom)
       |SELECT slot, n_days, s_fp, explained_fp
       |FROM seasonal, panel ORDER BY slot""".stripMargin

  // ---------------------------------------------------------------- x219

  /** CCF lag range (±[[CcfLags]] days). */
  private val CcfLags = 7

  /** x219: cross-correlation function between two nations' daily
    * customer revenue — does nation 0's demand lead or lag nation 1's?
    * Series align on the shared day grid (absent days are true zeros);
    * for each lag ∈ [−7, 7], Pearson r over the overlap from exact
    * integer moments with the one IEEE sqrt (the x211 recipe). The
    * lag join is an equi-join on di+lag — no window gymnastics, and
    * the same plan shape at any series length.
    *
    * Scale: one fact aggregate per nation (broadcast dimension
    * filters), a 15-row lag table cross join, and equi-joined moment
    * sums — everything map-side combinable. */
  def ccf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def series(nk: Int) = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .filter($"c_nationkey" === nk).select($"c_custkey")),
        $"o_custkey" === $"c_custkey")
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
    val a = series(0).toDF("di", "ya")
    val b = series(1).toDF("di", "yb")
    val grid = a.join(b, Seq("di"), "full")
      .na.fill(0L, Seq("ya", "yb"))
      .localCheckpoint(true)
    val lags = (-CcfLags to CcfLags).map(_.toLong).toDF("lag")
    val left = grid.select($"di", $"ya").crossJoin(broadcast(lags))
    val joined = left.join(grid.select($"di".as("dib"), $"yb"),
      left("di") - left("lag") === $"dib")
    joined.groupBy($"lag")
      .agg(count(lit(1)).as("n"), sum($"ya").as("sx"), sum($"yb").as("sy"),
        sum($"ya" * $"yb").as("sxy"), sum($"ya" * $"ya").as("sxx"),
        sum($"yb" * $"yb").as("syy"))
      .select($"lag", $"n",
        expr("CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0" +
          " THEN CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
          " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
          " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))" +
          " * 1000000 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("r_fp"))
      .orderBy($"lag")
  }

  private val ccfOracle = {
    def seriesSql(nk: Int) =
      s"""SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         |            AS BIGINT) AS di,
         |       CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
         |            AS BIGINT) AS y
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_nationkey = $nk GROUP BY 1""".stripMargin
    s"""WITH a AS (${seriesSql(0)}),
       |b AS (${seriesSql(1)}),
       |grid AS MATERIALIZED (
       |  SELECT COALESCE(a.di, b.di) AS di, COALESCE(a.y, 0) AS ya,
       |         COALESCE(b.y, 0) AS yb
       |  FROM a FULL JOIN b ON a.di = b.di),
       |lags AS (SELECT CAST(unnest(range(-$CcfLags, ${CcfLags + 1})) AS BIGINT)
       |           AS lag),
       |joined AS (
       |  SELECT l.lag, g1.ya, g2.yb
       |  FROM grid g1 CROSS JOIN lags l
       |  JOIN grid g2 ON g2.di = g1.di - l.lag),
       |mom AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n, CAST(sum(ya) AS BIGINT) AS sx,
       |         CAST(sum(yb) AS BIGINT) AS sy, CAST(sum(ya * yb) AS BIGINT) AS sxy,
       |         CAST(sum(ya * ya) AS BIGINT) AS sxx,
       |         CAST(sum(yb * yb) AS BIGINT) AS syy
       |  FROM joined GROUP BY lag)
       |SELECT lag, n,
       |       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
       |       THEN CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |         * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS r_fp
       |FROM mom
       |ORDER BY lag""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x218_seasonal_decompose",
      "STL-lite: 29-day moving-average trend, weekday-slot seasonal means, residual variance-explained panel",
      seasonalDecompose, Some(seasonalOracle)),
    QueryDef("x219_ccf",
      "lagged cross-correlation (-7..7) between nation-0 and nation-1 daily revenue: equi-joined integer moments per lag",
      ccf, Some(ccfOracle)))
}
