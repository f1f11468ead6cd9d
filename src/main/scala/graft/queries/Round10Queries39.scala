package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 thirty-ninth tier: time-series alignment and cooperative
  * attribution — dynamic time warping between two monthly revenue
  * curves (x208) and exact Shapley-value channel attribution (x209,
  * the axiomatic counterpart of x203's removal effects). */
object Round10Queries39 {

  /** DTW series length (months per compared year). */
  private val DtwLen = 12

  // ---------------------------------------------------------------- x208

  /** x208: dynamic time warping distance between the 1995 and 1996
    * monthly revenue curves (plus the lock-step L1 baseline the
    * warping must never exceed) — the alignment-tolerant series
    * distance behind "do these two seasons have the same shape,
    * shifted?". The DP recurrence D(i,j) = |a_i−b_j| +
    * min(D(i−1,j), D(i,j−1), D(i−1,j−1)) runs over the 12×12 grid in
    * row-major order as ONE exact-integer fold: Spark `aggregate` over
    * the 144 cell indices carrying the cost matrix as a flat array,
    * DuckDB a recursive CTE that re-emits the accumulated cells and
    * appends one per step. All costs are exact cents; no doubles
    * anywhere.
    *
    * Scale: the data-sized work is two month-grain aggregates; the DP
    * is a constant 144-step fold on one task regardless of corpus
    * size (series length is calendar-bounded). */
  def dtw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def monthly(yr: Int) = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") === yr)
      .groupBy(month($"o_orderdate").cast("long").as("m"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
    val a = monthly(1995).toDF("m", "ya")
    val b = monthly(1996).toDF("m", "yb")
    // Dense 1..12 grids (a month with no orders contributes 0 revenue).
    val grid = spark.range(1, DtwLen + 1).select($"id".as("m"))
      .join(a, Seq("m"), "left").join(b, Seq("m"), "left")
      .na.fill(0L, Seq("ya", "yb"))
    val folded = grid
      .agg(sort_array(collect_list(struct($"m", $"ya", $"yb"))).as("rows"))
      .select($"rows",
        expr(s"transform(rows, r -> r.ya)").as("va"),
        expr(s"transform(rows, r -> r.yb)").as("vb"))
      .select(
        expr(
          s"""aggregate(
             |  sequence(0, ${DtwLen * DtwLen - 1}),
             |  CAST(array() AS ARRAY<BIGINT>),
             |  (acc, t) -> concat(acc, array(
             |    abs(element_at(va, CAST(t div $DtwLen AS INT) + 1)
             |        - element_at(vb, CAST(t % $DtwLen AS INT) + 1))
             |    + CASE
             |        WHEN t div $DtwLen = 0 AND t % $DtwLen = 0 THEN CAST(0 AS BIGINT)
             |        WHEN t div $DtwLen = 0 THEN element_at(acc, CAST(t AS INT))
             |        WHEN t % $DtwLen = 0 THEN element_at(acc, CAST(t - $DtwLen AS INT) + 1)
             |        ELSE least(element_at(acc, CAST(t - $DtwLen AS INT) + 1),
             |                   element_at(acc, CAST(t AS INT)),
             |                   element_at(acc, CAST(t - $DtwLen AS INT)))
             |      END)))
             |""".stripMargin).as("d"),
        expr(s"aggregate(sequence(1, $DtwLen), CAST(0 AS BIGINT)," +
          s" (s, i) -> s + abs(element_at(va, CAST(i AS INT))" +
          s" - element_at(vb, CAST(i AS INT))))").as("l1_cents"))
      .select(expr(s"element_at(d, ${DtwLen * DtwLen})").as("dtw_cents"),
        $"l1_cents")
    folded
  }

  private val dtwOracle = {
    val n = DtwLen
    s"""WITH ma AS (
       |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |              AS BIGINT) AS y
       |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
       |mb AS (
       |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |              AS BIGINT) AS y
       |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
       |grid AS (
       |  SELECT g.m, COALESCE(ma.y, 0) AS ya, COALESCE(mb.y, 0) AS yb
       |  FROM (SELECT unnest(range(1, ${n + 1})) AS m) g
       |  LEFT JOIN ma ON ma.m = g.m LEFT JOIN mb ON mb.m = g.m),
       |vecs AS (
       |  SELECT list(ya ORDER BY m) AS va, list(yb ORDER BY m) AS vb
       |  FROM grid),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(CAST([] AS BIGINT[]),
       |                 [[CAST(t AS BIGINT)] FOR t IN range(0, ${n * n})]),
       |    (acc, x) -> list_append(acc,
       |       abs(va[CAST(x[1] // $n AS INT) + 1]
       |           - vb[CAST(x[1] % $n AS INT) + 1])
       |       + CASE
       |           WHEN x[1] // $n = 0 AND x[1] % $n = 0 THEN 0
       |           WHEN x[1] // $n = 0 THEN acc[CAST(x[1] AS INT)]
       |           WHEN x[1] % $n = 0 THEN acc[CAST(x[1] - $n AS INT) + 1]
       |           ELSE least(acc[CAST(x[1] - $n AS INT) + 1],
       |                      acc[CAST(x[1] AS INT)],
       |                      acc[CAST(x[1] - $n AS INT)])
       |         END)) AS d,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                  [abs(va[i] - vb[i]) FOR i IN range(1, ${n + 1})]),
       |                (s, x) -> s + x) AS l1_cents
       |  FROM vecs)
       |SELECT CAST(d[${n * n}] AS BIGINT) AS dtw_cents,
       |       CAST(l1_cents AS BIGINT) AS l1_cents
       |FROM folded""".stripMargin
  }

  // ---------------------------------------------------------------- x209

  /** Shapley coalition weights w(|S|)·4! for |S| = 0..3 — i.e.
    * |S|!·(4−1−|S|)! twelfths: {3, 1, 1, 3}/12. */
  private val ShapleyW12 = Seq(3L, 1L, 1L, 3L)

  /** x209: exact Shapley-value attribution over the four engagement
    * channels — the axiomatically fair split of conversion credit
    * (efficiency: the values sum to v(full) − v(∅)), complementing
    * x203's removal effects. The characteristic function
    * v(S) = conversion rate among users whose touched-channel set is
    * ⊆ S (computable exactly for all 16 coalitions from one user-grain
    * pass + a 16×16 subset join). φ_c = Σ_{S∌c} w(|S|)·(v(S∪c)−v(S))
    * with the 12·w literal integer weights above; v in 1e-6 fixed
    * point, one final /12 double render.
    *
    * Scale: one groupBy(user_id) builds (bitmask, converted); the
    * coalition lattice is 16 rows — constant whatever the corpus. */
  def shapley(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, dir)
      .groupBy($"user_id").agg(
        (max(when($"event_type" === "click", 1L)).cast("long") * 1 +
          max(when($"event_type" === "view", 1L)).cast("long") * 2 +
          max(when($"event_type" === "signup", 1L)).cast("long") * 4 +
          max(when($"event_type" === "error", 1L)).cast("long") * 8).as("mask0"),
        max(when($"event_type" === "purchase", 1L)).cast("long").as("conv0"))
      .select(coalesce($"mask0", lit(0L)).as("mask"),
        coalesce($"conv0", lit(0L)).as("conv"))
    val byMask = users.groupBy($"mask")
      .agg(count(lit(1)).as("nu"), sum($"conv").as("nc"))
      .localCheckpoint(true)
    val coalitions = spark.range(16).select($"id".as("s")).localCheckpoint(true)
    // v(S): users whose mask is a subset of S.
    val v = coalitions.join(byMask, expr("(mask & s) = mask"), "left")
      .groupBy($"s").agg(
        coalesce(sum($"nu"), lit(0L)).as("nu"),
        coalesce(sum($"nc"), lit(0L)).as("nc"))
      .select($"s",
        expr("CASE WHEN nu > 0 THEN CAST(floor(CAST(nc AS DOUBLE)" +
          " / CAST(nu AS DOUBLE) * 1000000 + 0.5) AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END").as("v_fp"))
      .localCheckpoint(true)
    val wCase = ShapleyW12.zipWithIndex
      .map { case (w, k) => s"WHEN $k THEN ${w}L" }
      .mkString("CASE bit_count(s) ", " ", " END")
    val channels = Seq((1L, "click"), (2L, "view"), (4L, "signup"),
      (8L, "error")).toDF("cbit", "channel")
    val terms = channels.crossJoin(v.toDF("s", "v_s"))
      .filter(expr("(s & cbit) = 0"))
      .join(v.toDF("s2", "v_s2"), expr("s2 = s + cbit"))
      .select($"channel", $"cbit",
        (expr(wCase) * ($"v_s2" - $"v_s")).as("t12"))
    val phis = terms.groupBy($"channel", $"cbit")
      .agg(sum($"t12").as("phi12_fp"))
    val tot = phis.agg(sum($"phi12_fp").as("tot12"))
    phis.crossJoin(broadcast(tot))
      .select($"channel", $"phi12_fp",
        expr("CAST(floor(CAST(phi12_fp AS DOUBLE) / 12.0 + 0.5) AS BIGINT)")
          .as("phi_fp"),
        expr("CASE WHEN tot12 > 0 THEN CAST(floor(CAST(phi12_fp AS DOUBLE)" +
          " / CAST(tot12 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END").as("share_fp"))
      .orderBy($"channel")
  }

  private val shapleyOracle = {
    val wCase = ShapleyW12.zipWithIndex
      .map { case (w, k) => s"WHEN $k THEN $w" }
      .mkString("CASE bit_count(s) ", " ", " END")
    s"""WITH users AS MATERIALIZED (
       |  SELECT COALESCE(max(CASE WHEN event_type = 'click' THEN 1 END) * 1, 0)
       |       + COALESCE(max(CASE WHEN event_type = 'view' THEN 1 END) * 2, 0)
       |       + COALESCE(max(CASE WHEN event_type = 'signup' THEN 1 END) * 4, 0)
       |       + COALESCE(max(CASE WHEN event_type = 'error' THEN 1 END) * 8, 0) AS mask,
       |         COALESCE(max(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS conv
       |  FROM events GROUP BY user_id),
       |by_mask AS (
       |  SELECT mask, CAST(count(*) AS BIGINT) AS nu, CAST(sum(conv) AS BIGINT) AS nc
       |  FROM users GROUP BY mask),
       |coalitions AS (SELECT unnest(range(0, 16)) AS s),
       |v AS MATERIALIZED (
       |  SELECT s,
       |         CASE WHEN COALESCE(sum(nu), 0) > 0
       |           THEN CAST(floor(CAST(COALESCE(sum(nc), 0) AS DOUBLE)
       |             / CAST(COALESCE(sum(nu), 0) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
       |           ELSE 0 END AS v_fp
       |  FROM coalitions LEFT JOIN by_mask ON (mask & s) = mask
       |  GROUP BY s),
       |channels(cbit, channel) AS (VALUES (1, 'click'), (2, 'view'),
       |                                   (4, 'signup'), (8, 'error')),
       |terms AS (
       |  SELECT c.channel, c.cbit,
       |         (${wCase.replace("bit_count(s)", "bit_count(v1.s)")})
       |           * (v2.v_fp - v1.v_fp) AS t12
       |  FROM channels c
       |  JOIN v v1 ON (v1.s & c.cbit) = 0
       |  JOIN v v2 ON v2.s = v1.s + c.cbit),
       |phis AS (
       |  SELECT channel, cbit, CAST(sum(t12) AS BIGINT) AS phi12_fp
       |  FROM terms GROUP BY channel, cbit),
       |tot AS (SELECT CAST(sum(phi12_fp) AS BIGINT) AS tot12 FROM phis)
       |SELECT channel, phi12_fp,
       |       CAST(floor(CAST(phi12_fp AS DOUBLE) / 12.0 + 0.5) AS BIGINT) AS phi_fp,
       |       CASE WHEN tot12 > 0 THEN CAST(floor(CAST(phi12_fp AS DOUBLE)
       |              / CAST(tot12 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
       |            ELSE 0 END AS share_fp
       |FROM phis, tot
       |ORDER BY channel""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x208_dtw",
      "dynamic time warping between 1995/1996 monthly revenue curves: exact-integer 144-cell DP fold plus the lock-step L1 bound",
      dtw, Some(dtwOracle)),
    QueryDef("x209_shapley",
      "exact Shapley channel attribution over the 16-coalition lattice: subset-join characteristic function, literal factorial weights",
      shapley, Some(shapleyOracle)))
}
