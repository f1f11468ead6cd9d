package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 eighth tier: the BLOCKED-design inference pair that completes
  * the exact-rank battery (x310–x313, x322) — Friedman's rank test
  * (k correlated treatments over b blocks) and Cochran's Q (its binary
  * special case, the k-treatment generalization of x312 McNemar).
  * Same x270 contract: every rank/count statistic is a BIGINT census sum
  * (doubled ranks for half-integer ties), the χ² statistic is one final
  * double projection written identically in both engines, and the
  * significance flag compares the UNQUANTIZED double against a literal
  * critical value so the flag is engine-deterministic.
  */
object Round13Queries8 {

  /** The fixture's closed event-type domain (x277 known-domain contract —
    * completing the block×treatment frame needs the full treatment list
    * even when a block never saw a type). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  /** χ²(k−1 = 4, 0.05) upper critical value. */
  private val Chi2Crit4 = 9.487729037

  // ---------------------------------------------------------------- x331

  /** x331: Friedman test — do the five event types keep the same activity
    * ordering across the seven weekdays, or does at least one type's
    * traffic rank shift by weekday? Blocks = weekday, treatments = event
    * type, response = event count. The block×treatment frame is COMPLETED
    * (cross join of observed weekdays × the closed type domain, absent
    * cells at n = 0 — the q105 complete-the-frame rule) so every block
    * ranks exactly k = 5 treatments. Within-block ties get doubled
    * average ranks off the per-(dow, n) census: r2 = 2·|smaller| +
    * |tied| + 1. With doubled ranks the tie-robust Conover form
    *   T = (k−1)·(ΣⱼR2ⱼ² − b²k(k+1)²) / (Σᵢⱼr2ᵢⱼ² − bk(k+1)²)
    * is PURE BIGINT in numerator and denominator (the 1/4 factors
    * cancel); the division is the only double op. sig compares T against
    * χ²₀.₀₅,₄ = 9.487729037.
    *
    * Scale: one map-side-combinable groupBy(dow, type) pass over the
    * corpus; everything after runs on a ≤ 7·5-row frame. The doubled
    * rank sums are bounded by 2bk — overflow-free at any corpus size. */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(dayofweek($"ts").cast("long").as("dow"), $"event_type")
    val census = ev.groupBy($"dow", $"event_type").agg(count(lit(1)).as("n"))
    val frame = ev.select($"dow").distinct()
      .crossJoin(EventTypes.toDF("event_type"))
      .join(census, Seq("dow", "event_type"), "left")
      .select($"dow", $"event_type", coalesce($"n", lit(0L)).as("n"))
    val byN = frame.groupBy($"dow", $"n").agg(count(lit(1)).as("t"))
    val w = Window.partitionBy($"dow").orderBy($"n").rowsBetween(Long.MinValue, -1)
    val r2n = byN.withColumn(
      "r2", lit(2L) * coalesce(sum($"t").over(w), lit(0L)) + $"t" + 1L)
    val ranked = frame.join(r2n, Seq("dow", "n"))
    def r2of(tp: String) =
      sum(when($"event_type" === tp, $"r2").otherwise(0L)).as(s"r2_$tp")
    val agg = ranked.agg(
      countDistinct($"dow").as("b"),
      sum($"r2" * $"r2").as("a2"),
      r2of("click"), r2of("error"), r2of("purchase"), r2of("signup"), r2of("view"))
    def d(c: Column) = c.cast("double")
    val k = lit(5L)
    val sumR2sq = d($"r2_click") * d($"r2_click") + d($"r2_error") * d($"r2_error") +
      d($"r2_purchase") * d($"r2_purchase") + d($"r2_signup") * d($"r2_signup") +
      d($"r2_view") * d($"r2_view")
    val tUnc = d(k - 1L) * (sumR2sq - d($"b" * $"b") * d(k) * lit(36.0)) /
      (d($"a2") - d($"b") * d(k) * lit(36.0))
    agg.select($"b", $"a2",
      $"r2_click", $"r2_error", $"r2_purchase", $"r2_signup", $"r2_view",
      QueryUtil.halfUp4(tUnc).as("t_stat"),
      when(tUnc > Chi2Crit4, 1L).otherwise(0L).as("sig"))
  }

  private val friedmanOracle =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, event_type FROM events),
       |census AS (
       |  SELECT dow, event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM ev GROUP BY 1, 2),
       |frame AS (
       |  SELECT d.dow, t.event_type, COALESCE(c.n, 0) AS n
       |  FROM (SELECT DISTINCT dow FROM ev) d
       |  CROSS JOIN (VALUES ('click'), ('error'), ('purchase'), ('signup'),
       |              ('view')) t(event_type)
       |  LEFT JOIN census c ON c.dow = d.dow AND c.event_type = t.event_type),
       |by_n AS (
       |  SELECT dow, n, CAST(count(*) AS BIGINT) AS t FROM frame GROUP BY 1, 2),
       |r2n AS (
       |  SELECT *, 2 * COALESCE(sum(t) OVER (PARTITION BY dow ORDER BY n
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
       |  FROM by_n),
       |ranked AS (
       |  SELECT f.dow, f.event_type, r.r2
       |  FROM frame f JOIN r2n r ON r.dow = f.dow AND r.n = f.n),
       |agg AS (
       |  SELECT CAST(count(DISTINCT dow) AS BIGINT) AS b,
       |         CAST(sum(r2 * r2) AS BIGINT) AS a2,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN r2 ELSE 0 END) AS BIGINT) AS r2_click,
       |         CAST(sum(CASE WHEN event_type = 'error' THEN r2 ELSE 0 END) AS BIGINT) AS r2_error,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN r2 ELSE 0 END) AS BIGINT) AS r2_purchase,
       |         CAST(sum(CASE WHEN event_type = 'signup' THEN r2 ELSE 0 END) AS BIGINT) AS r2_signup,
       |         CAST(sum(CASE WHEN event_type = 'view' THEN r2 ELSE 0 END) AS BIGINT) AS r2_view
       |  FROM ranked),
       |stat AS (
       |  SELECT *,
       |         4.0 * (CAST(r2_click AS DOUBLE) * CAST(r2_click AS DOUBLE)
       |                + CAST(r2_error AS DOUBLE) * CAST(r2_error AS DOUBLE)
       |                + CAST(r2_purchase AS DOUBLE) * CAST(r2_purchase AS DOUBLE)
       |                + CAST(r2_signup AS DOUBLE) * CAST(r2_signup AS DOUBLE)
       |                + CAST(r2_view AS DOUBLE) * CAST(r2_view AS DOUBLE)
       |                - CAST(b * b AS DOUBLE) * 5.0 * 36.0)
       |         / (CAST(a2 AS DOUBLE) - CAST(b AS DOUBLE) * 5.0 * 36.0) AS t_raw
       |  FROM agg)
       |SELECT b, a2, r2_click, r2_error, r2_purchase, r2_signup, r2_view,
       |       floor(t_raw * 10000 + 0.5) / 10000.0 AS t_stat,
       |       CAST(CASE WHEN t_raw > $Chi2Crit4 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM stat""".stripMargin

  // ---------------------------------------------------------------- x332

  /** x332: Cochran's Q — for each user (block) mark each event type
    * (treatment) as an above-average habit (binary success: 5·c_ut >
    * Σc_u, a cross-multiplied integer predicate so the threshold is
    * exact and scale-free), then ask whether the five types have equal
    * success probability across users. Q = (k−1)(kΣⱼCⱼ² − N²) /
    * (kN − ΣᵢRᵢ²) — every term a BIGINT census sum (blocks with all-0 or
    * all-k rows cancel from the denominator automatically: kRᵢ − Rᵢ² =
    * 0). sig vs χ²₀.₀₅,₄. This is x312 McNemar generalized from 2
    * matched treatments to k = 5.
    *
    * Scale: one groupBy(user, type) pass, then a groupBy(user) over the
    * (users × 5)-row frame — both map-side combinable; no joins. */
  def cochranQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def c(tp: String) =
      sum(when($"event_type" === tp, 1L).otherwise(0L)).as(s"c_$tp")
    val perUser = Tables.events(spark, dir)
      .select($"user_id", $"event_type")
      .groupBy($"user_id")
      .agg(c("click"), c("error"), c("purchase"), c("signup"), c("view"))
    val tot = $"c_click" + $"c_error" + $"c_purchase" + $"c_signup" + $"c_view"
    def x(tp: String) =
      when(col(s"c_$tp") * 5L > tot, 1L).otherwise(0L)
    val bin = perUser.select(
      x("click").as("x_click"), x("error").as("x_error"),
      x("purchase").as("x_purchase"), x("signup").as("x_signup"),
      x("view").as("x_view"))
      .withColumn("r", $"x_click" + $"x_error" + $"x_purchase" + $"x_signup" + $"x_view")
    val agg = bin.agg(
      count(lit(1)).as("b"),
      sum($"x_click").as("c_click"), sum($"x_error").as("c_error"),
      sum($"x_purchase").as("c_purchase"), sum($"x_signup").as("c_signup"),
      sum($"x_view").as("c_view"),
      sum($"r").as("n_succ"), sum($"r" * $"r").as("rsq"))
    def d(col0: Column) = col0.cast("double")
    val sumCsq = d($"c_click") * d($"c_click") + d($"c_error") * d($"c_error") +
      d($"c_purchase") * d($"c_purchase") + d($"c_signup") * d($"c_signup") +
      d($"c_view") * d($"c_view")
    val qUnc = lit(4.0) * (lit(5.0) * sumCsq - d($"n_succ") * d($"n_succ")) /
      (lit(5.0) * d($"n_succ") - d($"rsq"))
    agg.select($"b", $"n_succ", $"rsq",
      $"c_click", $"c_error", $"c_purchase", $"c_signup", $"c_view",
      QueryUtil.halfUp4(qUnc).as("q_stat"),
      when(qUnc > Chi2Crit4, 1L).otherwise(0L).as("sig"))
  }

  private val cochranQOracle =
    s"""WITH per_user AS MATERIALIZED (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_click,
       |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c_error,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_purchase,
       |         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c_signup,
       |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_view
       |  FROM events GROUP BY 1),
       |bin AS (
       |  SELECT CASE WHEN c_click * 5 > c_click + c_error + c_purchase + c_signup + c_view THEN 1 ELSE 0 END AS x_click,
       |         CASE WHEN c_error * 5 > c_click + c_error + c_purchase + c_signup + c_view THEN 1 ELSE 0 END AS x_error,
       |         CASE WHEN c_purchase * 5 > c_click + c_error + c_purchase + c_signup + c_view THEN 1 ELSE 0 END AS x_purchase,
       |         CASE WHEN c_signup * 5 > c_click + c_error + c_purchase + c_signup + c_view THEN 1 ELSE 0 END AS x_signup,
       |         CASE WHEN c_view * 5 > c_click + c_error + c_purchase + c_signup + c_view THEN 1 ELSE 0 END AS x_view
       |  FROM per_user),
       |rows_ AS (
       |  SELECT *, x_click + x_error + x_purchase + x_signup + x_view AS r FROM bin),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS b,
       |         CAST(sum(x_click) AS BIGINT) AS c_click,
       |         CAST(sum(x_error) AS BIGINT) AS c_error,
       |         CAST(sum(x_purchase) AS BIGINT) AS c_purchase,
       |         CAST(sum(x_signup) AS BIGINT) AS c_signup,
       |         CAST(sum(x_view) AS BIGINT) AS c_view,
       |         CAST(sum(r) AS BIGINT) AS n_succ,
       |         CAST(sum(r * r) AS BIGINT) AS rsq
       |  FROM rows_),
       |stat AS (
       |  SELECT *,
       |         4.0 * (5.0 * (CAST(c_click AS DOUBLE) * CAST(c_click AS DOUBLE)
       |                       + CAST(c_error AS DOUBLE) * CAST(c_error AS DOUBLE)
       |                       + CAST(c_purchase AS DOUBLE) * CAST(c_purchase AS DOUBLE)
       |                       + CAST(c_signup AS DOUBLE) * CAST(c_signup AS DOUBLE)
       |                       + CAST(c_view AS DOUBLE) * CAST(c_view AS DOUBLE))
       |                - CAST(n_succ AS DOUBLE) * CAST(n_succ AS DOUBLE))
       |         / (5.0 * CAST(n_succ AS DOUBLE) - CAST(rsq AS DOUBLE)) AS q_raw
       |  FROM agg)
       |SELECT b, n_succ, rsq, c_click, c_error, c_purchase, c_signup, c_view,
       |       floor(q_raw * 10000 + 0.5) / 10000.0 AS q_stat,
       |       CAST(CASE WHEN q_raw > $Chi2Crit4 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM stat""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x331_friedman",
      "Friedman blocked rank test (weekday blocks x event-type treatments): doubled-rank BIGINT census, tie-robust Conover form",
      friedman, Some(friedmanOracle)),
    QueryDef("x332_cochran_q",
      "Cochran's Q over per-user binary habit indicators: k-treatment McNemar generalization, pure BIGINT census sums",
      cochranQ, Some(cochranQOracle)))
}
