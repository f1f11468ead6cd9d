package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 ninth tier: join-view incremental maintenance (the q51
  * counterpart for JOINs), exact-integer rolling anomaly detection, and a
  * LATERAL-join top-k whose Spark plan is the decorrelated window form a
  * scale-aware engine wants. */
object Round10Queries9 {

  /** q100: incremental view maintenance for an equi-join view — the delta
    * rule ΔJ = (ΔA⋈B0) ∪ (A0⋈ΔB) ∪ (ΔA⋈ΔB) applied by
    * `Sinks.mergeJoinState`. Orders arriving after the cutoff are ΔA;
    * every 7th customer is a late-arriving dimension row (ΔB). The stored
    * view J0 = A0⋈B0 is materialized once (localCheckpoint — the refresh
    * provably cannot re-derive it), the three delta joins are each
    * delta-sized, and the maintained view aggregates per nation. The
    * oracle recomputes the FULL join in one pass, so the hash match proves
    * maintain ≡ recompute — the join analogue of q51's aggregate IVM.
    *
    * Scale: each refresh costs O(|Δ|) join work against key-partitioned
    * bases (never |A0|·|B0|); at 100 TB the stored view and bases share
    * one bucketing on the join key so the delta joins are exchange-free
    * on the big side. Integer cents make the aggregate drift-proof. */
  def joinIvm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1995-06-01").cast("date")
    val o = Tables.orders(spark, dir).select(
      $"o_custkey", $"o_orderkey", $"o_orderdate",
      floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
    val c = Tables.customer(spark, dir)
      .select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val a0 = o.filter($"o_orderdate" < cutoff)
    val dA = o.filter($"o_orderdate" >= cutoff)
    val b0 = c.filter($"o_custkey" % 7 =!= 0)
    val dB = c.filter($"o_custkey" % 7 === 0)
    val j0 = a0.join(b0, "o_custkey").localCheckpoint(true) // stored view
    graft.sinks.Sinks.mergeJoinState(j0, a0, b0, dA, dB, "o_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("sum_cents"))
      .orderBy($"c_nationkey")
  }

  private val joinIvmOracle =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q101: rolling z-score anomaly flags over the per-(type, day) count
    * series — the monitoring primitive a pipeline health dashboard runs
    * over ingest volumes. The trailing window is the 7 calendar days
    * BEFORE each day (absent days count zero, denominator fixed at 7), and
    * the spike predicate |x − μ| > 2σ is evaluated as the cross-multiplied
    * EXACT-integer form (7x − S)² > 4·(7·SS − S²) with S = Σxᵢ,
    * SS = Σxᵢ² — no float mean, no float variance, no ulp drift between
    * engines. Days with an empty trailing window (σ = 0, S = 0) flag iff
    * x > 0: a first-ever burst IS an anomaly under this rule, and the
    * oracle agrees by construction.
    *
    * Scale: the series is a per-(type, day) count (one corpus-sized
    * aggregate); the trailing join is banded by the 7-day bound on the
    * tiny day-panel, same shape as x67's decay join. */
  def rollingZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dc = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("2024-01-01")).as("dayn"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // both sides of the trailing-window join
    val past = dc.select($"event_type".as("p_type"), $"dayn".as("p_dayn"),
      $"cnt".as("p_cnt"))
    dc.join(past, $"event_type" === $"p_type" &&
        $"p_dayn" >= $"dayn" - 7 && $"p_dayn" <= $"dayn" - 1, "left")
      .groupBy($"event_type", $"dayn", $"cnt")
      .agg(coalesce(sum($"p_cnt"), lit(0L)).as("s"),
        coalesce(sum($"p_cnt" * $"p_cnt"), lit(0L)).as("ss"))
      .select($"event_type", $"dayn", $"cnt", $"s", $"ss",
        ((lit(7) * $"cnt" - $"s") * (lit(7) * $"cnt" - $"s") >
          lit(4) * (lit(7) * $"ss" - $"s" * $"s")).cast("int").as("is_spike"))
      .orderBy($"event_type", $"dayn")
  }

  private val rollingZscoreOracle =
    """WITH dc AS MATERIALIZED (
      |  SELECT event_type,
      |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT c.event_type, c.dayn, c.cnt,
      |       CAST(coalesce(sum(p.cnt), 0) AS BIGINT) AS s,
      |       CAST(coalesce(sum(p.cnt * p.cnt), 0) AS BIGINT) AS ss,
      |       CAST((7 * c.cnt - coalesce(sum(p.cnt), 0))
      |              * (7 * c.cnt - coalesce(sum(p.cnt), 0))
      |            > 4 * (7 * coalesce(sum(p.cnt * p.cnt), 0)
      |                   - coalesce(sum(p.cnt), 0) * coalesce(sum(p.cnt), 0))
      |            AS INTEGER) AS is_spike
      |FROM dc c LEFT JOIN dc p
      |  ON c.event_type = p.event_type
      | AND p.dayn >= c.dayn - 7 AND p.dayn <= c.dayn - 1
      |GROUP BY c.event_type, c.dayn, c.cnt
      |ORDER BY c.event_type, c.dayn""".stripMargin

  /** q102: per-group top-k as a LATERAL join — the SQL surface DuckDB
    * (and Postgres) users write for "top 2 customers per nation". The
    * oracle runs the literal `JOIN LATERAL (... ORDER BY ... LIMIT 2)`;
    * the Spark side runs the DECORRELATED plan that form must lower to at
    * scale — one ranking window over the fact side + filter, then one
    * broadcast dim join — because executing a correlated subquery per
    * outer row is a nested loop. The hash match proves the rewrite
    * preserves semantics incl. tie handling (acctbal desc, name asc) and
    * the inner-join effect on nations with no customers.
    *
    * Scale: one customer shuffle on c_nationkey for the window, dim
    * broadcast; no per-nation re-scan. */
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_name")
    val top = Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_name", $"c_acctbal")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 2)
    top.join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_name", $"c_acctbal", $"rnk")
      .orderBy($"n_name", $"rnk")
  }

  private val lateralTopkOracle =
    """SELECT n_name, t.c_name, t.c_acctbal, CAST(t.rnk AS INTEGER) AS rnk
      |FROM nation JOIN LATERAL (
      |  SELECT c_name, c_acctbal,
      |         row_number() OVER (ORDER BY c_acctbal DESC, c_name) AS rnk
      |  FROM customer WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
      |ORDER BY n_name, t.rnk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q100_join_ivm",
      "incremental JOIN-view maintenance: stored view + three delta joins == one-pass full-join recompute",
      joinIvm, Some(joinIvmOracle)),
    QueryDef("q101_rolling_zscore",
      "trailing-7-day z-score anomaly flags in exact cross-multiplied integer arithmetic",
      rollingZscore, Some(rollingZscoreOracle)),
    QueryDef("q102_lateral_topk",
      "per-group top-k: Spark decorrelated window plan == DuckDB literal LATERAL LIMIT oracle",
      lateralTopk, Some(lateralTopkOracle)))
}
