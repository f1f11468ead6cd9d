package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 twelfth tier: time-series structure operators — change-point
  * LOCALIZATION by binary segmentation (q60's CUSUM detects drift; this
  * finds WHERE the level shifted, by exact between-group sum-of-squares
  * over prefix sums) and an STL-lite seasonal decomposition (weekday
  * medians of the 7-scaled detrended series — every trend/seasonal/
  * residual value an exact integer, no float smoothing anywhere).
  */
object Round11Queries12 {

  // ---------------------------------------------------------------- x271

  /** x271: change-point localization (one-split binary segmentation) on
    * the daily order-count series — the split t maximizing the
    * between-group sum of squares `(S1·n − S·n1)² / (n1·n2)` over all
    * candidate positions, computed from ONE prefix-sum pass: the
    * numerator root `S1·n − S·n1` is an exact BIGINT (≤ ~1.5e9 at
    * sf0.1), squared and divided in doubles derived from identical
    * integers (engine-stable), with (t) as the deterministic tie-break.
    * Emits the split date, both segment means, and the score.
    *
    * Scale: the corpus-sized stage is the per-day count; the candidate
    * scan is |days| rows through one running-sum window — binary
    * segmentation's recursive splits would repeat this O(log k) times,
    * never touching row-level data again. */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .select(to_date($"o_orderdate").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("y"))
      .localCheckpoint(true)
    val tot = daily.agg(sum($"y").as("s"), count(lit(1)).as("n"))
    val wOrd = Window.orderBy($"day")
    val pre = daily
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("s1", sum($"y").over(wOrd.rowsBetween(Long.MinValue, 0)))
      .crossJoin(broadcast(tot))
      .filter($"t" < $"n") // a split needs a non-empty right segment
      .withColumn("diff", $"s1" * $"n" - $"s" * $"t")
      .withColumn("g",
        ($"diff".cast("double") * $"diff".cast("double"))
          / ($"t".cast("double") * ($"n" - $"t").cast("double")))
    pre
      .withColumn("rn", row_number().over(
        Window.orderBy($"g".desc, $"t")))
      .filter($"rn" === 1)
      .select($"day".as("split_day"), $"t".as("n_left"),
        ($"n" - $"t").as("n_right"), $"s1".as("sum_left"),
        ($"s" - $"s1").as("sum_right"), $"diff",
        QueryUtil.halfUp4($"s1".cast("double") / $"t".cast("double")).as("mean_left"),
        QueryUtil.halfUp4(($"s" - $"s1").cast("double")
          / ($"n" - $"t").cast("double")).as("mean_right"),
        QueryUtil.halfUp4($"g").as("score"))
  }

  private val changepointOracle =
    """WITH daily AS MATERIALIZED (
      |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(y) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      |        FROM daily),
      |pre AS (
      |  SELECT day,
      |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |         CAST(sum(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |              AS BIGINT) AS s1,
      |         s, n
      |  FROM daily, tot),
      |scored AS (
      |  SELECT *, s1 * n - s * t AS diff,
      |         (CAST(s1 * n - s * t AS DOUBLE) * CAST(s1 * n - s * t AS DOUBLE))
      |           / (CAST(t AS DOUBLE) * CAST(n - t AS DOUBLE)) AS g
      |  FROM pre WHERE t < n)
      |SELECT day AS split_day, t AS n_left, n - t AS n_right,
      |       s1 AS sum_left, s - s1 AS sum_right, diff,
      |       floor(CAST(s1 AS DOUBLE) / CAST(t AS DOUBLE) * 10000 + 0.5)
      |         / 10000.0 AS mean_left,
      |       floor(CAST(s - s1 AS DOUBLE) / CAST(n - t AS DOUBLE) * 10000 + 0.5)
      |         / 10000.0 AS mean_right,
      |       floor(g * 10000 + 0.5) / 10000.0 AS score
      |FROM (SELECT *, row_number() OVER (ORDER BY g DESC, t) AS rn FROM scored)
      |WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- x272

  /** x272: STL-lite seasonal decomposition of the daily order counts —
    * trend = 7·(centered 7-day moving average) kept as the exact
    * integer window SUM, detrended = 7y − trend (integer, full-window
    * days only), weekday seasonal = the lower median of each weekday's
    * detrended values (exact rank selection), residual = detrended −
    * seasonal. Weekday indexing is the fixture-independent
    * `((d % 7) + 7) % 7` spelling over epoch-day differences (the
    * ADVICE-r10 modulo rule). Emits the 7 weekday rows with exact
    * 7ths-scaled seasonals plus a variance-explained audit from exact
    * integer sums of squares.
    *
    * Scale: one per-day count, one 7-row-window sum, one per-weekday
    * rank — all |days|-sized after the first aggregate. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .select(to_date($"o_orderdate").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("y"))
      .localCheckpoint(true)
    val wOrd = Window.orderBy($"day")
    val n = Window.partitionBy(lit(1))
    val trended = daily
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("nd", count(lit(1)).over(n))
      .withColumn("tr7", sum($"y").over(wOrd.rowsBetween(-3, 3)))
      .filter($"rn" > 3 && $"rn" <= $"nd" - 3)
      .withColumn("detr", lit(7L) * $"y" - $"tr7")
      .withColumn("dow",
        ((datediff($"day", lit(java.sql.Date.valueOf("1995-01-01"))) % 7 + 7) % 7)
          .cast("long"))
      .localCheckpoint(true)
    val wDow = Window.partitionBy($"dow")
    val med = trended
      .withColumn("rk", row_number().over(wDow.orderBy($"detr", $"day")))
      .withColumn("cnt", count(lit(1)).over(wDow))
      .filter($"rk" === expr("(cnt + 1) DIV 2"))
      .select($"dow", $"detr".as("seas7"), $"cnt".as("n_days"))
    val audit = trended.join(broadcast(med.select($"dow", $"seas7")), "dow")
      .agg(sum($"detr" * $"detr").as("ss_detr"),
        sum(($"detr" - $"seas7") * ($"detr" - $"seas7")).as("ss_resid"))
    med.crossJoin(broadcast(audit))
      .select($"dow", $"n_days", $"seas7",
        QueryUtil.halfUp4($"seas7".cast("double") / 7.0).as("seasonal"),
        $"ss_detr", $"ss_resid",
        QueryUtil.halfUp4(lit(1.0)
          - $"ss_resid".cast("double") / $"ss_detr".cast("double"))
          .as("var_explained"))
      .orderBy($"dow")
  }

  private val seasonalDecomposeOracle =
    """WITH daily AS MATERIALIZED (
      |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |trended AS MATERIALIZED (
      |  SELECT day, y, detr,
      |         ((datediff('day', DATE '1995-01-01', day) % 7) + 7) % 7 AS dow
      |  FROM (
      |    SELECT day, y,
      |           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
      |           CAST(count(*) OVER () AS BIGINT) AS nd,
      |           7 * y - CAST(sum(y) OVER (ORDER BY day
      |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS detr
      |    FROM daily)
      |  WHERE rn > 3 AND rn <= nd - 3),
      |med AS (
      |  SELECT dow, detr AS seas7, cnt AS n_days FROM (
      |    SELECT dow, detr,
      |           row_number() OVER (PARTITION BY dow ORDER BY detr, day) AS rk,
      |           CAST(count(*) OVER (PARTITION BY dow) AS BIGINT) AS cnt
      |    FROM trended)
      |  WHERE rk = (cnt + 1) // 2),
      |audit AS (
      |  SELECT CAST(sum(t.detr * t.detr) AS BIGINT) AS ss_detr,
      |         CAST(sum((t.detr - m.seas7) * (t.detr - m.seas7)) AS BIGINT)
      |           AS ss_resid
      |  FROM trended t JOIN med m ON m.dow = t.dow)
      |SELECT dow, n_days, seas7,
      |       floor(CAST(seas7 AS DOUBLE) / 7.0 * 10000 + 0.5) / 10000.0
      |         AS seasonal,
      |       ss_detr, ss_resid,
      |       floor((1.0 - CAST(ss_resid AS DOUBLE) / CAST(ss_detr AS DOUBLE))
      |             * 10000 + 0.5) / 10000.0 AS var_explained
      |FROM med, audit
      |ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x271_changepoint",
      "binary-segmentation change-point localization via exact prefix-sum between-group SS",
      changepoint, Some(changepointOracle)),
    QueryDef("x272_seasonal_decompose",
      "STL-lite weekday decomposition: integer 7-scaled trend/seasonal/residual with SS audit",
      seasonalDecompose, Some(seasonalDecomposeOracle)))
}
