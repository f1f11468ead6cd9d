package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 thirty-fourth tier: scorecard-style feature diagnostics —
  * weight-of-evidence / information-value binning (x199) and the exact
  * Gini concentration coefficient over the customer revenue Lorenz
  * curve (q113). */
object Round10Queries34 {

  /** WoE bin count (ntile over the account-balance order). */
  private val WoeBins = 10

  // ---------------------------------------------------------------- x199

  /** x199: weight-of-evidence / information value — the credit-scoring
    * audit of how well a continuous feature (account balance, decile-
    * binned) separates a binary outcome (customer placed ≥1 URGENT
    * order). Per bin: WoE = ln(good-share / bad-share) with +1 Laplace
    * smoothing so empty cells stay finite, quantized to 1e-6 fixed
    * point from a ratio of exact integers (the x56 recipe — both
    * engines take ln of the same IEEE double, then one floor). The IV
    * column repeats the Σ(Δshare·WoE) total so the single result set
    * carries both the per-bin diagnostic and the headline number.
    *
    * Scale: outcome flags reduce orders with a map-side partial
    * aggregate; the ntile ranks customer-level rows (a per-key
    * aggregate, not the fact table); everything after the binning is
    * a 10-row frame. */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey")).distinct()
    val labeled = Tables.customer(spark, dir)
      .join(urgent.withColumn("is_good", lit(1L)), Seq("c_custkey"), "left")
      .na.fill(0L, Seq("is_good"))
      .select($"c_custkey", $"c_acctbal", $"is_good")
    val binned = labeled.withColumn("bin",
      ntile(WoeBins).over(Window.orderBy($"c_acctbal", $"c_custkey"))
        .cast("long"))
    val perBin = binned.groupBy($"bin").agg(
      sum($"is_good").as("n_good"),
      sum(lit(1L) - $"is_good").as("n_bad"))
    val totals = perBin.agg(sum($"n_good").as("gt"), sum($"n_bad").as("bt"))
    val woe = perBin.crossJoin(broadcast(totals)).select(
      $"bin", $"n_good", $"n_bad",
      expr(s"CAST(floor(ln(CAST((n_good + 1) * (bt + $WoeBins) AS DOUBLE)" +
        s" / CAST((n_bad + 1) * (gt + $WoeBins) AS DOUBLE)) * 1000000 + 0.5)" +
        " AS BIGINT)").as("woe_fp"),
      expr("CAST(floor((CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE)" +
        " - CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE)) * 1000000 + 0.5)" +
        " AS BIGINT)").as("dshare_fp"))
    val iv = woe.agg(
      sum(expr("CAST(floor(CAST(dshare_fp AS DOUBLE) * CAST(woe_fp AS DOUBLE)" +
        " / 1000000.0 + 0.5) AS BIGINT)")).as("iv_fp"))
    woe.crossJoin(broadcast(iv))
      .select($"bin", $"n_good", $"n_bad", $"woe_fp", $"iv_fp")
      .orderBy($"bin")
  }

  private val woeOracle =
    s"""WITH urgent AS (
       |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT'),
       |labeled AS (
       |  SELECT c.c_custkey, c.c_acctbal,
       |         CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_good
       |  FROM customer c LEFT JOIN urgent u ON c.c_custkey = u.c_custkey),
       |binned AS (
       |  SELECT *, CAST(ntile($WoeBins) OVER (ORDER BY c_acctbal, c_custkey)
       |                 AS BIGINT) AS bin
       |  FROM labeled),
       |per_bin AS (
       |  SELECT bin, CAST(sum(is_good) AS BIGINT) AS n_good,
       |         CAST(sum(1 - is_good) AS BIGINT) AS n_bad
       |  FROM binned GROUP BY bin),
       |totals AS (SELECT CAST(sum(n_good) AS BIGINT) AS gt,
       |                  CAST(sum(n_bad) AS BIGINT) AS bt FROM per_bin),
       |woe AS (
       |  SELECT bin, n_good, n_bad,
       |         CAST(floor(ln(CAST((n_good + 1) * (bt + $WoeBins) AS DOUBLE)
       |           / CAST((n_bad + 1) * (gt + $WoeBins) AS DOUBLE)) * 1000000 + 0.5)
       |           AS BIGINT) AS woe_fp,
       |         CAST(floor((CAST(n_good AS DOUBLE) / CAST(gt AS DOUBLE)
       |           - CAST(n_bad AS DOUBLE) / CAST(bt AS DOUBLE)) * 1000000 + 0.5)
       |           AS BIGINT) AS dshare_fp
       |  FROM per_bin, totals),
       |iv AS (
       |  SELECT CAST(sum(CAST(floor(CAST(dshare_fp AS DOUBLE)
       |           * CAST(woe_fp AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT))
       |           AS BIGINT) AS iv_fp
       |  FROM woe)
       |SELECT bin, n_good, n_bad, woe_fp, iv_fp
       |FROM woe, iv ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q113

  /** q113: Gini concentration coefficient of customer revenue — the
    * Lorenz-curve summary behind q63's Pareto deciles and q58's HHI.
    * Customers with no orders enter at zero revenue (the part of the
    * curve a join-only analysis silently drops). Revenue is exact
    * cents; with x(1..n) rank-ordered (custkey tie-break), the exact
    * identity G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) uses one
    * BIGINT weighted sum — no trapezoid approximation — quantized to
    * 1e-6 at the very end.
    *
    * Scale: one fact-table aggregate to customer grain, then a global
    * rank over customer-level rows (the q63 sort pattern); Σ i·x_i
    * stays in int64 well past sf100 (rank × cents ≈ 2^50 at 1e7
    * customers) and the division is the only double op. */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("cents"))
    val perCust = Tables.customer(spark, dir)
      .join(rev, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", coalesce($"cents", lit(0L)).as("x"))
    val ranked = perCust.withColumn("i",
      row_number().over(Window.orderBy($"x", $"c_custkey")).cast("long"))
    ranked.agg(
      count(lit(1)).as("n"),
      sum($"x").as("total_cents"),
      sum($"i" * $"x").as("wsum"))
      .select($"n", $"total_cents",
        expr("CAST(floor((2.0 * CAST(wsum AS DOUBLE)" +
          " - CAST((n + 1) * total_cents AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("gini_fp"))
  }

  private val giniOracle =
    """WITH rev AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |per_cust AS (
      |  SELECT c.c_custkey, CAST(COALESCE(r.cents, 0) AS BIGINT) AS x
      |  FROM customer c LEFT JOIN rev r ON c.c_custkey = r.o_custkey),
      |ranked AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY x, c_custkey) AS BIGINT) AS i
      |  FROM per_cust)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(x) AS BIGINT) AS total_cents,
      |       CAST(floor((2.0 * CAST(sum(i * x) AS DOUBLE)
      |         - CAST((count(*) + 1) * sum(x) AS DOUBLE))
      |         / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
      |         * 1000000 + 0.5) AS BIGINT) AS gini_fp
      |FROM ranked""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x199_woe_iv",
      "weight-of-evidence / information-value binning: acctbal deciles vs has-urgent-order outcome, Laplace-smoothed ln in 1e-6 fixed point",
      woeIv, Some(woeOracle)),
    QueryDef("q113_gini",
      "exact Gini concentration of customer revenue (zero-revenue customers included) via the rank-weighted-sum identity",
      giniRevenue, Some(giniOracle)))
}
