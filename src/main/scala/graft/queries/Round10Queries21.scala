package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 twenty-first tier: forecast backtesting — the time-series
  * capability the anomaly tier (q59/q60/q101) monitors but never
  * forecasts: evaluate baseline forecasters against realized values with
  * scale-free error metrics. */
object Round10Queries21 {

  /** q110: seasonal-naive forecast backtest — the standard baseline panel
    * a forecasting service must beat: per event type and day, predict
    * ŷ(d) = y(d−7) (seasonal naive) and ŷ(d) = y(d−1) (naive-1), score
    * both by MAE over the days where BOTH forecasts exist (one shared
    * evaluation window, or the comparison is unfair), and report MASE =
    * MAE_seasonal / MAE_naive1 — the scale-free skill score (MASE < 1 ⟺
    * weekly seasonality carries signal). Absolute errors are exact
    * integer count differences; the single division is half-up rounded
    * once.
    *
    * Scale: the series is the per-(type, day) count panel; both
    * predictors are self-joins banded by fixed lags on that tiny panel —
    * the x67 shape, nothing corpus-sized after the first aggregate. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dc = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("2024-01-01")).as("dayn"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // actuals + two lag joins
    def lagJoin(k: Int, name: String) = dc.select($"event_type",
      ($"dayn" + k).as("dayn"), $"cnt".as(name))
    dc.join(lagJoin(7, "p_seasonal"), Seq("event_type", "dayn"))
      .join(lagJoin(1, "p_naive1"), Seq("event_type", "dayn"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs($"cnt" - $"p_seasonal")).as("ae_seasonal"),
        sum(abs($"cnt" - $"p_naive1")).as("ae_naive1"))
      .select($"event_type", $"n_days", $"ae_seasonal", $"ae_naive1",
        halfUp4($"ae_seasonal".cast("double") / $"n_days".cast("double")).as("mae_seasonal"),
        halfUp4($"ae_naive1".cast("double") / $"n_days".cast("double")).as("mae_naive1"),
        when($"ae_naive1" > 0,
          halfUp4($"ae_seasonal".cast("double") / $"ae_naive1".cast("double")))
          .otherwise(lit(null).cast("double")).as("mase"),
        ($"ae_seasonal" < $"ae_naive1").cast("int").as("seasonal_wins"))
      .orderBy("event_type")
  }

  private val forecastBacktestOracle =
    """WITH dc AS MATERIALIZED (
      |  SELECT event_type,
      |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |j AS (SELECT a.event_type, a.dayn, a.cnt,
      |        s.cnt AS p_seasonal, n.cnt AS p_naive1
      |      FROM dc a
      |      JOIN dc s ON s.event_type = a.event_type AND s.dayn = a.dayn - 7
      |      JOIN dc n ON n.event_type = a.event_type AND n.dayn = a.dayn - 1)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(abs(cnt - p_seasonal)) AS BIGINT) AS ae_seasonal,
      |       CAST(sum(abs(cnt - p_naive1)) AS BIGINT) AS ae_naive1,
      |       floor(CAST(sum(abs(cnt - p_seasonal)) AS DOUBLE) / count(*) * 10000 + 0.5)
      |         / 10000.0 AS mae_seasonal,
      |       floor(CAST(sum(abs(cnt - p_naive1)) AS DOUBLE) / count(*) * 10000 + 0.5)
      |         / 10000.0 AS mae_naive1,
      |       CASE WHEN sum(abs(cnt - p_naive1)) > 0
      |            THEN floor(CAST(sum(abs(cnt - p_seasonal)) AS DOUBLE)
      |                       / CAST(sum(abs(cnt - p_naive1)) AS DOUBLE) * 10000 + 0.5) / 10000.0
      |            END AS mase,
      |       CAST(sum(abs(cnt - p_seasonal)) < sum(abs(cnt - p_naive1)) AS INTEGER)
      |         AS seasonal_wins
      |FROM j
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_forecast_backtest",
      "seasonal-naive vs naive-1 forecast backtest on one shared window: exact-integer MAE, MASE skill score",
      forecastBacktest, Some(forecastBacktestOracle)))
}
