package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 thirty-third tier: survival analysis over the event log —
  * the Kaplan–Meier product-limit curve for time-to-first-purchase
  * (x197) and the two-cohort log-rank test on the same durations
  * (x198). Both are exact-integer / fixed-point by construction so the
  * DuckDB oracle hashes bit-identically. */
object Round10Queries33 {

  /** Microseconds per hour (the duration grid unit). */
  private val UsPerHour = 3600000000L

  // ---------------------------------------------------------------- x197

  /** x197: Kaplan–Meier survival curve for time-to-first-purchase.
    * Per user: duration = hours from their first event to their first
    * `purchase` (event observed), or to their last event when they
    * never purchase (right-censored — the defining reason a plain
    * "average conversion time over converters" is biased and KM is
    * the standard fix). At-risk n(t) counts every user with duration
    * ≥ t (censored-at-t users are at risk for events at t, the usual
    * convention), computed as one descending cumulative sum over the
    * duration grid. The survival recursion S(t_i) = S(t_{i-1})·(n−d)/n
    * floors to 1e-6 fixed point at EVERY step in both engines — Spark
    * folds the (grid-sized) array with `aggregate`, DuckDB with a
    * recursive CTE — so the product is exact integer arithmetic, not
    * a drift-prone exp/sum-of-logs.
    *
    * Scale: the only data-sized work is one groupBy(user_id) with
    * partial aggregation; the grid is bounded by the observation
    * window in hours (≤ ~720 here), so the collect+fold is O(window),
    * independent of row count — at 100 TB the fold input is still a
    * few hundred structs on one task. */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir).groupBy($"user_id").agg(
      min(unix_micros($"ts".cast("timestamp"))).as("t0"),
      max(unix_micros($"ts".cast("timestamp"))).as("tend"),
      min(when($"event_type" === "purchase", unix_micros($"ts".cast("timestamp")))).as("tp"))
    val durs = perUser.select(
      when($"tp".isNotNull, expr(s"(tp - t0) div $UsPerHour"))
        .otherwise(expr(s"(tend - t0) div $UsPerHour")).as("t"),
      when($"tp".isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))
    val grid = durs.groupBy($"t")
      .agg(sum($"e").as("d"), sum(lit(1L) - $"e").as("c"))
    val wDesc = Window.orderBy($"t".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = grid.select($"t", $"d", $"c",
      sum($"d" + $"c").over(wDesc).as("n"))
    risk
      .agg(sort_array(collect_list(struct($"t", $"d", $"c", $"n"))).as("rows"))
      .select(explode(expr(
        """aggregate(rows,
          |  array(named_struct('t', CAST(-1 AS BIGINT), 'd', CAST(0 AS BIGINT),
          |                     'c', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT),
          |                     's', CAST(1000000 AS BIGINT))),
          |  (acc, x) -> concat(acc, array(named_struct(
          |    't', x.t, 'd', x.d, 'c', x.c, 'n', x.n,
          |    's', (element_at(acc, -1).s * (x.n - x.d)) div x.n))))
          |""".stripMargin)).as("r"))
      .select($"r.t".as("t"), $"r.n".as("n_risk"), $"r.d".as("d_events"),
        $"r.c".as("c_censored"), $"r.s".as("surv_fp"))
      .filter($"t" >= 0)
      .orderBy($"t")
  }

  private val kmOracle =
    s"""WITH RECURSIVE pu AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS tend,
       |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
       |  FROM events GROUP BY user_id),
       |durs AS (
       |  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // $UsPerHour
       |              ELSE (tend - t0) // $UsPerHour END AS t,
       |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
       |  FROM pu),
       |grid AS (
       |  SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1 - e) AS BIGINT) AS c
       |  FROM durs GROUP BY t),
       |risk AS (
       |  SELECT t, d, c,
       |         CAST(sum(d + c) OVER (ORDER BY t DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
       |         CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
       |  FROM grid),
       |km AS (
       |  SELECT i, t, d, c, n, CAST((1000000 * (n - d)) // n AS BIGINT) AS s
       |  FROM risk WHERE i = 1
       |  UNION ALL
       |  SELECT r.i, r.t, r.d, r.c, r.n,
       |         CAST((km.s * (r.n - r.d)) // r.n AS BIGINT)
       |  FROM risk r JOIN km ON r.i = km.i + 1)
       |SELECT t, n AS n_risk, d AS d_events, c AS c_censored, s AS surv_fp
       |FROM km ORDER BY t""".stripMargin

  // ---------------------------------------------------------------- x198

  /** x198: two-cohort log-rank test on the x197 durations — does the
    * treatment arm (deterministic user-id parity assignment, the q104
    * A/B pattern — a calendar split degenerates to one cohort at small
    * SFs) convert at a different hazard? At each event time:
    * observed cohort-1 conversions d1, expected d·n1/n under the null,
    * and the hypergeometric variance d·(n1/n)·(1−n1/n)·(n−d)/(n−1);
    * χ² = (O−E)²/V. Every per-time term quantizes to 1e-6 fixed point
    * BEFORE the sum (ratios of exact integers evaluated in one spelled-
    * out association order → bit-identical doubles in both engines,
    * then an order-free integer sum); the variance is computed in
    * DOUBLE from the start so the formula never overflows int64 no
    * matter the user count.
    *
    * Scale: one groupBy(user_id), then everything runs on the
    * hour-grid × 2 cohorts (≤ ~1.5k rows regardless of data size);
    * the grid cross join is a broadcast of a window-bounded frame. */
  def logRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir).groupBy($"user_id").agg(
      min(unix_micros($"ts".cast("timestamp"))).as("t0"),
      max(unix_micros($"ts".cast("timestamp"))).as("tend"),
      min(when($"event_type" === "purchase", unix_micros($"ts".cast("timestamp")))).as("tp"))
    val durs = perUser.select(
      pmod($"user_id", lit(2L)).as("g"),
      when($"tp".isNotNull, expr(s"(tp - t0) div $UsPerHour"))
        .otherwise(expr(s"(tend - t0) div $UsPerHour")).as("t"),
      when($"tp".isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))
    val h = durs.groupBy($"g", $"t")
      .agg(count(lit(1)).as("a"), sum($"e").as("d"))
    val full = durs.select($"t").distinct()
      .crossJoin(Seq(0L, 1L).toDF("g"))
      .join(h, Seq("g", "t"), "left")
      .na.fill(0L, Seq("a", "d"))
    val wg = Window.partitionBy($"g").orderBy($"t".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = full.select($"g", $"t", $"d", sum($"a").over(wg).as("n"))
    val byT = risk.groupBy($"t").agg(
      sum(when($"g" === 1L, $"d").otherwise(0L)).as("d1"),
      sum(when($"g" === 1L, $"n").otherwise(0L)).as("n1"),
      sum($"d").as("dt"), sum($"n").as("nt"))
      .filter($"dt" > 0)
    val stats = byT.agg(
      sum($"d1").as("o1"),
      sum(expr("CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)" +
        " / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")).as("e1_fp"),
      sum(expr("CASE WHEN nt > 1 THEN CAST(floor(CAST(dt AS DOUBLE)" +
        " * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)" +
        " * CAST(nt - n1 AS DOUBLE) / CAST(nt AS DOUBLE)" +
        " * CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE)" +
        " * 1000000 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END")).as("v_fp"))
    val sizes = durs.agg(
      sum(when($"g" === 1L, 1L).otherwise(0L)).as("n_treat"),
      sum(when($"g" === 0L, 1L).otherwise(0L)).as("n_ctrl"))
    stats.crossJoin(broadcast(sizes))
      .select($"n_treat", $"n_ctrl", $"o1", $"e1_fp", $"v_fp",
        expr("CASE WHEN v_fp > 0 THEN" +
          " CAST(floor((CAST(o1 * 1000000 - e1_fp AS DOUBLE) / 1000000.0)" +
          " * (CAST(o1 * 1000000 - e1_fp AS DOUBLE) / 1000000.0)" +
          " / (CAST(v_fp AS DOUBLE) / 1000000.0) * 10000 + 0.5) AS DOUBLE)" +
          " / 10000.0 ELSE CAST(0.0 AS DOUBLE) END").as("chi2"))
  }

  private val logRankOracle =
    s"""WITH pu AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t0,
       |         max(epoch_us(ts)) AS tend,
       |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
       |  FROM events GROUP BY user_id),
       |durs AS (
       |  SELECT user_id % 2 AS g,
       |         CASE WHEN tp IS NOT NULL THEN (tp - t0) // $UsPerHour
       |              ELSE (tend - t0) // $UsPerHour END AS t,
       |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
       |  FROM pu),
       |h AS (SELECT g, t, CAST(count(*) AS BIGINT) AS a,
       |             CAST(sum(e) AS BIGINT) AS d
       |      FROM durs GROUP BY g, t),
       |full0 AS (
       |  SELECT gg.g, tt.t, COALESCE(h.a, 0) AS a, COALESCE(h.d, 0) AS d
       |  FROM (SELECT DISTINCT t FROM durs) tt
       |  CROSS JOIN (SELECT 0 AS g UNION ALL SELECT 1) gg
       |  LEFT JOIN h ON h.g = gg.g AND h.t = tt.t),
       |risk AS (
       |  SELECT g, t, d,
       |         CAST(sum(a) OVER (PARTITION BY g ORDER BY t DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
       |  FROM full0),
       |byt AS (
       |  SELECT t,
       |         CAST(sum(CASE WHEN g = 1 THEN d ELSE 0 END) AS BIGINT) AS d1,
       |         CAST(sum(CASE WHEN g = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(sum(d) AS BIGINT) AS dt, CAST(sum(n) AS BIGINT) AS nt
       |  FROM risk GROUP BY t HAVING sum(d) > 0),
       |stats AS (
       |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
       |         CAST(sum(CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
       |             / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS e1_fp,
       |         CAST(sum(CASE WHEN nt > 1 THEN CAST(floor(CAST(dt AS DOUBLE)
       |             * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)
       |             * CAST(nt - n1 AS DOUBLE) / CAST(nt AS DOUBLE)
       |             * CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE)
       |             * 1000000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_fp
       |  FROM byt),
       |sizes AS (
       |  SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
       |         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl
       |  FROM durs)
       |SELECT n_treat, n_ctrl, o1, e1_fp, v_fp,
       |       CASE WHEN v_fp > 0 THEN
       |         floor((CAST(o1 * 1000000 - e1_fp AS DOUBLE) / 1000000.0)
       |               * (CAST(o1 * 1000000 - e1_fp AS DOUBLE) / 1000000.0)
       |               / (CAST(v_fp AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000.0
       |       ELSE 0.0 END AS chi2
       |FROM stats, sizes""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x197_kaplan_meier",
      "Kaplan-Meier time-to-first-purchase: right-censored durations, descending-cumsum risk set, exact-integer product-limit fold",
      kaplanMeier, Some(kmOracle)),
    QueryDef("x198_logrank",
      "two-arm log-rank test (hash-assigned A/B arms) on the x197 durations: O-E and hypergeometric variance in 1e-6 fixed point",
      logRank, Some(logRankOracle)))
}
