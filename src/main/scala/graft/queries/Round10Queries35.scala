package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 thirty-fifth tier: experimentation workhorses — CUPED
  * variance-reduced lift estimation (x200) and the one-way ANOVA
  * F-test (x201). Both are moment-method queries: every statistic
  * derives from exact integer sums (order-free under partitioned
  * aggregation), with doubles entering only in the final spelled-out
  * formulas. */
object Round10Queries35 {

  // ---------------------------------------------------------------- x200

  /** x200: CUPED — variance-reduced A/B lift on purchase revenue. Arms
    * are the x198 hash assignment (user_id parity); the metric Y is a
    * user's purchase cents in the second half of the window, the
    * covariate X the same user's purchase cents in the FIRST half
    * (pre-period — unaffected by treatment by construction).
    * θ = cov(X,Y)/var(X) from global moments, then the adjusted lift
    * is the arm difference of mean(Y) − θ·(mean_g(X) − mean(X)). The
    * published variance-reduction ratio 1 − var(Y−θX)/var(Y) uses the
    * analytic identity var(Y) − 2θcov + θ²var(X) — no second data
    * pass. All five moments (Σx, Σy, Σxy, Σx², Σy²) are exact integer
    * sums at user grain; θ and the outputs are ratios of those
    * integers evaluated in one spelled-out double association.
    *
    * Scale: one groupBy(user_id) with two conditional sums, then a
    * two-row (per-arm) and one-row (global) aggregate — nothing
    * data-sized after the first shuffle. */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val half = lit("2024-01-16").cast("timestamp")
    val perUser = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(
        sum(when($"ts" < half, floor($"value" * 100 + 0.5).cast("long"))
          .otherwise(0L)).as("x"),
        sum(when($"ts" >= half, floor($"value" * 100 + 0.5).cast("long"))
          .otherwise(0L)).as("y"))
      .select(pmod($"user_id", lit(2L)).as("g"), $"x", $"y")
    val glob = perUser.agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    val arms = perUser.groupBy($"g").agg(
      count(lit(1)).as("ng"), sum($"x").as("sxg"), sum($"y").as("syg"))
    val wide = arms.groupBy().pivot("g", Seq(0L, 1L)).agg(
      first($"ng").as("n"), first($"sxg").as("sx"), first($"syg").as("sy"))
      .toDF("n0", "sx0", "sy0", "n1", "sx1", "sy1")
    wide.crossJoin(broadcast(glob)).selectExpr(
      "n0", "n1",
      // θ in 1e-6 fixed point (ratio of exact integer moments).
      "CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
        " * 1000000 + 0.5) AS BIGINT) AS theta_fp",
      // Raw lift: mean(Y|1) − mean(Y|0), cents quantized to 1e-2.
      "CAST(floor((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
        " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 100 + 0.5)" +
        " AS BIGINT) AS lift_raw_c100",
      // CUPED lift: the θ·(meanX_g − meanX) corrections cancel the
      // global meanX, leaving lift_raw − θ·(meanX_1 − meanX_0).
      "CAST(floor((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
        " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)" +
        " - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
        " * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
        " - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))) * 100 + 0.5)" +
        " AS BIGINT) AS lift_cuped_c100",
      // Variance-reduction ratio 1 − var(Y−θX)/var(Y) = corr(X,Y)² in
      // 1e-6 fixed point.
      "CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
        " / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))" +
        " * 1000000 + 0.5) AS BIGINT) AS varred_fp")
  }

  private val cupedOracle =
    """WITH per_user AS (
      |  SELECT user_id % 2 AS g,
      |         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
      |           CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
      |           CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |g0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM per_user),
      |arms AS (
      |  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
      |         CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
      |         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
      |         CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
      |  FROM per_user)
      |SELECT n0, n1,
      |       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * 1000000 + 0.5) AS BIGINT) AS theta_fp,
      |       CAST(floor((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |         - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 100 + 0.5)
      |         AS BIGINT) AS lift_raw_c100,
      |       CAST(floor((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |         - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |         - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |         - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))) * 100 + 0.5)
      |         AS BIGINT) AS lift_cuped_c100,
      |       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
      |         * 1000000 + 0.5) AS BIGINT) AS varred_fp
      |FROM arms, g0""".stripMargin

  // ---------------------------------------------------------------- x201

  /** x201: one-way ANOVA — does mean order value differ across the five
    * order priorities? Per-group exact integer moments (whole-dollar
    * units so Σx² stays in int64 past sf100); the within/between sums
    * of squares quantize to integers PER GROUP before the k-row sum
    * (a raw double sum over groups would be association-order-
    * dependent), then F = (SSB/df1)/(SSW/df2) and η² = SSB/SST in one
    * spelled-out double formula. Output: one row per priority with its
    * mean, plus the replicated F / η² headline (the x199 pattern).
    *
    * Scale: a single map-side-combined groupBy over the fact table to
    * 5 moment rows; everything else is constant-size. */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("priority"),
        floor($"o_totalprice" + 0.5).cast("long").as("x"))
      .groupBy($"priority")
      .agg(count(lit(1)).as("ng"), sum($"x").as("sxg"),
        sum($"x" * $"x").as("sxxg"))
    val parts = m.select($"priority", $"ng", $"sxg", $"sxxg",
      expr("CAST(floor(CAST(sxxg AS DOUBLE) - CAST(sxg AS DOUBLE)" +
        " * CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE) + 0.5) AS BIGINT)")
        .as("ssw_g"),
      expr("CAST(floor(CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE)" +
        " / CAST(ng AS DOUBLE) + 0.5) AS BIGINT)").as("sq_g"))
    val tot = parts.agg(
      count(lit(1)).as("k"), sum($"ng").as("n"), sum($"sxg").as("sx"),
      sum($"ssw_g").as("ssw"), sum($"sq_g").as("sq"))
    parts.crossJoin(broadcast(tot))
      .withColumn("ssb",
        expr("CAST(floor(CAST(sq AS DOUBLE) - CAST(sx AS DOUBLE)" +
          " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)"))
      .select($"priority", $"ng",
        expr("CAST(floor(CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE) * 100 + 0.5)" +
          " AS BIGINT)").as("mean_d100"),
        $"ssb", $"ssw",
        expr("CAST(k - 1 AS BIGINT)").as("df1"),
        expr("CAST(n - k AS BIGINT)").as("df2"),
        expr("CAST(floor((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))" +
          " / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))" +
          " * 10000 + 0.5) AS DOUBLE) / 10000.0").as("f"),
        expr("CAST(floor(CAST(ssb AS DOUBLE)" +
          " / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("eta2_fp"))
      .orderBy($"priority")
  }

  private val anovaOracle =
    """WITH m AS (
      |  SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS ng,
      |         CAST(sum(x) AS BIGINT) AS sxg, CAST(sum(x * x) AS BIGINT) AS sxxg
      |  FROM (SELECT o_orderpriority,
      |               CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x FROM orders) t
      |  GROUP BY o_orderpriority),
      |parts AS (
      |  SELECT priority, ng, sxg, sxxg,
      |         CAST(floor(CAST(sxxg AS DOUBLE) - CAST(sxg AS DOUBLE)
      |           * CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE) + 0.5) AS BIGINT) AS ssw_g,
      |         CAST(floor(CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE)
      |           / CAST(ng AS DOUBLE) + 0.5) AS BIGINT) AS sq_g
      |  FROM m),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |         CAST(sum(sxg) AS BIGINT) AS sx, CAST(sum(ssw_g) AS BIGINT) AS ssw,
      |         CAST(sum(sq_g) AS BIGINT) AS sq
      |  FROM parts),
      |wb AS (
      |  SELECT *, CAST(floor(CAST(sq AS DOUBLE) - CAST(sx AS DOUBLE)
      |    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS ssb
      |  FROM parts, tot)
      |SELECT priority, ng,
      |       CAST(floor(CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE) * 100 + 0.5)
      |         AS BIGINT) AS mean_d100,
      |       ssb, ssw,
      |       CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
      |       CAST(floor((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
      |         / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
      |         * 10000 + 0.5) AS DOUBLE) / 10000.0 AS f,
      |       CAST(floor(CAST(ssb AS DOUBLE)
      |         / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE))
      |         * 1000000 + 0.5) AS BIGINT) AS eta2_fp
      |FROM wb ORDER BY priority""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x200_cuped",
      "CUPED variance-reduced A/B lift: pre-period covariate, analytic var(Y-thetaX), exact integer moments at user grain",
      cuped, Some(cupedOracle)),
    QueryDef("x201_anova",
      "one-way ANOVA F-test of order value across priorities: per-group integer moments, group-quantized SS, spelled-out F and eta2",
      anova, Some(anovaOracle)))
}
