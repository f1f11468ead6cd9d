package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 fiftieth tier: irregular-time aggregation and tail risk —
  * time-weighted averages over the event step function (x226) and
  * VaR/CVaR of daily revenue swings (x227). */
object Round10Queries50 {

  /** Published users (largest TWAP-vs-naive divergence). */
  private val TwapTop = 20

  // ---------------------------------------------------------------- x226

  /** x226: TWAP — the time-weighted average of a user's event `value`,
    * treating it as a step function that holds until the next event
    * (the correct mean for irregularly sampled metrics; the naive
    * per-event mean over-weights bursts). Each interval weight is
    * exact microseconds, each value exact cents, so the TWAP is one
    * integer Σ(v·Δt) div ΣΔt per user. Publishes the [[TwapTop]]
    * users where the naive mean diverges most — the burst-bias
    * report.
    *
    * Scale: one user-partitioned lead() window and a per-user
    * aggregate; the divergence rank is user-grain (the q63 sort
    * shape). */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val iv = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        floor($"value" * 100 + 0.5).cast("long").as("v"))
      .select($"user_id", $"v",
        (lead($"us", 1).over(w) - $"us").as("dur"))
      .filter($"dur".isNotNull && $"dur" > 0)
    val perUser = iv.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        sum($"v" * $"dur").as("svd"), sum($"dur").as("sd"))
      .select($"user_id", $"n",
        expr("(svd) div sd").as("twap_c"),
        expr("sv div n").as("naive_c"))
      .withColumn("bias_c", abs($"twap_c" - $"naive_c"))
    perUser.withColumn("rk", row_number().over(
      Window.orderBy($"bias_c".desc, $"user_id")).cast("long"))
      .filter($"rk" <= TwapTop)
      .select($"rk", $"user_id", $"n", $"twap_c", $"naive_c", $"bias_c")
      .orderBy($"rk")
  }

  private val twapOracle =
    s"""WITH iv AS MATERIALIZED (
       |  SELECT user_id, v, dur FROM (
       |    SELECT user_id,
       |           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
       |           lead(epoch_us(ts)) OVER (PARTITION BY user_id
       |             ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dur
       |    FROM events) t
       |  WHERE dur IS NOT NULL AND dur > 0),
       |per_user AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(v * dur) // sum(dur) AS BIGINT) AS twap_c,
       |         CAST(sum(v) // count(*) AS BIGINT) AS naive_c
       |  FROM iv GROUP BY user_id),
       |ranked AS (
       |  SELECT user_id, n, twap_c, naive_c,
       |         abs(twap_c - naive_c) AS bias_c,
       |         CAST(row_number() OVER (ORDER BY abs(twap_c - naive_c) DESC,
       |           user_id) AS BIGINT) AS rk
       |  FROM per_user)
       |SELECT rk, user_id, n, twap_c, naive_c, bias_c
       |FROM ranked WHERE rk <= $TwapTop
       |ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- x227

  /** Tail fraction (per mille) for the VaR cut. */
  private val TailPm = 50L

  /** x227: VaR/CVaR of day-over-day revenue swings — the tail-risk
    * panel: the 5% worst daily deltas define VaR (the exact k-th order
    * statistic, rank-based — no interpolation ambiguity) and CVaR is
    * the mean of those worst k (floor-double division: the sum is
    * negative). Whole-dollar deltas keep every sum exact.
    *
    * Scale: one date-grain aggregate, one lag window, one
    * WindowGroupLimit-pruned rank over the ~2.5k-day frame. */
  def cvar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
    val w = Window.orderBy($"di")
    val deltas = daily
      .select($"di", ($"y" - lag($"y", 1).over(w)).as("d"))
      .filter($"d".isNotNull)
      .localCheckpoint(true)
    val n = deltas.agg(count(lit(1)).as("n"))
      .select($"n", expr(s"greatest(1, (n * $TailPm) div 1000)").as("k"))
    val ranked = deltas.withColumn("rk", row_number().over(
      Window.orderBy($"d", $"di")).cast("long"))
    ranked.crossJoin(broadcast(n))
      .filter($"rk" <= $"k")
      .groupBy($"n", $"k")
      .agg(max($"d").as("var_d"),
        expr("CAST(floor(CAST(sum(d) AS DOUBLE) / CAST(count(1) AS DOUBLE)" +
          " * 100 + 0.5) AS BIGINT)").as("cvar_d100"))
      .select($"n", $"k", $"var_d", $"cvar_d100")
  }

  private val cvarOracle =
    s"""WITH daily AS (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |deltas AS MATERIALIZED (
       |  SELECT di, d FROM (
       |    SELECT di, y - lag(y) OVER (ORDER BY di) AS d FROM daily) t
       |  WHERE d IS NOT NULL),
       |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(greatest(1, (count(*) * $TailPm) // 1000) AS BIGINT) AS k
       |       FROM deltas),
       |ranked AS (
       |  SELECT d, CAST(row_number() OVER (ORDER BY d, di) AS BIGINT) AS rk
       |  FROM deltas)
       |SELECT n, k, CAST(max(d) AS BIGINT) AS var_d,
       |       CAST(floor(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         * 100 + 0.5) AS BIGINT) AS cvar_d100
       |FROM ranked, n0 WHERE rk <= k
       |GROUP BY n, k""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x226_twap",
      "time-weighted average of the event value step function per user: exact integer us-weighted sums, burst-bias top-20",
      twap, Some(twapOracle)),
    QueryDef("x227_cvar",
      "VaR/CVaR of day-over-day revenue swings: exact k-th order statistic cut, floor-double tail mean",
      cvar, Some(cvarOracle)))
}
