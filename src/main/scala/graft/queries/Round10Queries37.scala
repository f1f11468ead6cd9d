package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 thirty-seventh tier: monotone calibration, distribution
  * distance, and trend forecasting — isotonic regression via the
  * minimax identity (x204), 1-D Wasserstein drift between two yearly
  * revenue distributions (x205), and a Holt linear-trend backtest
  * (x206). */
object Round10Queries37 {

  /** Isotonic bin count. */
  private val IsoBins = 12

  // ---------------------------------------------------------------- x204

  /** x204: isotonic regression — calibrate the urgent-order rate
    * against order value so the fitted curve is monotone
    * non-decreasing (the calibration step behind score→probability
    * mapping, where raw bin rates wiggle). Instead of the sequential
    * pool-adjacent-violators stack, this uses the exact minimax
    * identity ŷ_k = max_{i≤k} min_{j≥k} avg(y[i..j]) — every interval
    * average is a ratio of two exact integer prefix-sums quantized to
    * 1e-6 BEFORE the min/max (so the order statistics compare
    * identical integers in both engines). O(B³) pairs over B=12 bins
    * is a constant-size frame.
    *
    * Scale: one ntile over order-grain rows (q62's segment pattern),
    * one 12-row aggregate; the minimax grid never touches data. */
  def isotonic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = Tables.orders(spark, dir).select(
      ntile(IsoBins).over(Window.orderBy($"o_totalprice", $"o_orderkey"))
        .cast("long").as("bin"),
      when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("y"))
    val bins = binned.groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("ny"))
    val w = Window.orderBy($"bin")
    val pre = bins.select($"bin", $"n", $"ny",
      sum($"n").over(w).as("cn"), sum($"ny").over(w).as("cy"))
      .localCheckpoint(true)
    val lo = pre.select($"bin".as("i"), ($"cn" - $"n").as("cn0"),
      ($"cy" - $"ny").as("cy0"))
    val hi = pre.select($"bin".as("j"), $"cn".as("cn1"), $"cy".as("cy1"))
    val pairs = lo.crossJoin(hi).filter($"i" <= $"j")
      .select($"i", $"j",
        expr("CAST(floor(CAST(cy1 - cy0 AS DOUBLE) / CAST(cn1 - cn0 AS DOUBLE)" +
          " * 1000000 + 0.5) AS BIGINT)").as("avg_fp"))
    val ks = pre.select($"bin".as("k"))
    val fit = ks.join(pairs, $"i" <= $"k" && $"j" >= $"k")
      .groupBy($"k", $"i").agg(min($"avg_fp").as("mn"))
      .groupBy($"k").agg(max($"mn").as("iso_rate_fp"))
    pre.join(fit, $"bin" === $"k")
      .select($"bin", $"n",
        expr("CAST(floor(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)" +
          " * 1000000 + 0.5) AS BIGINT)").as("raw_rate_fp"),
        $"iso_rate_fp")
      .orderBy($"bin")
  }

  private val isotonicOracle =
    s"""WITH binned AS MATERIALIZED (
       |  SELECT CAST(ntile($IsoBins) OVER (ORDER BY o_totalprice, o_orderkey)
       |              AS BIGINT) AS bin,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
       |  FROM orders),
       |bins AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS ny
       |  FROM binned GROUP BY bin),
       |pre AS MATERIALIZED (
       |  SELECT bin, n, ny,
       |         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |         CAST(sum(ny) OVER (ORDER BY bin) AS BIGINT) AS cy
       |  FROM bins),
       |pairs AS (
       |  SELECT l.bin AS i, h.bin AS j,
       |         CAST(floor(CAST(h.cy - (l.cy - l.ny) AS DOUBLE)
       |           / CAST(h.cn - (l.cn - l.n) AS DOUBLE) * 1000000 + 0.5)
       |           AS BIGINT) AS avg_fp
       |  FROM pre l JOIN pre h ON l.bin <= h.bin),
       |fit AS (
       |  SELECT k, CAST(max(mn) AS BIGINT) AS iso_rate_fp FROM (
       |    SELECT p0.bin AS k, p.i, min(p.avg_fp) AS mn
       |    FROM pre p0 JOIN pairs p ON p.i <= p0.bin AND p.j >= p0.bin
       |    GROUP BY p0.bin, p.i) t
       |  GROUP BY k)
       |SELECT pre.bin, pre.n,
       |       CAST(floor(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)
       |         * 1000000 + 0.5) AS BIGINT) AS raw_rate_fp,
       |       fit.iso_rate_fp
       |FROM pre JOIN fit ON fit.k = pre.bin
       |ORDER BY pre.bin""".stripMargin

  // ---------------------------------------------------------------- x205

  /** Wasserstein histogram bin width (dollars). */
  private val W1BinDollars = 10000L

  /** x205: 1-D Wasserstein-1 (earth mover's) distance between the 1995
    * and 1996 order-value distributions — the drift metric that, unlike
    * x23's JS divergence, reports HOW FAR mass moved, in dollars. On a
    * shared equal-width grid, W1 = binwidth·Σ_bins |cum(p̂_a − p̂_b)|:
    * shares are exact integer divisions (1e-9 fixed point), the
    * cumulative difference is one window pass over the ≤ ~60-row grid,
    * and the output is the integer Σ plus its dollar rendering.
    *
    * Scale: two filtered histogram aggregates (map-side combined);
    * the grid is value-range-bounded, independent of row count. */
  def wasserstein(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def hist(yr: Int) = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") === yr)
      .groupBy((floor($"o_totalprice" / W1BinDollars)).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val a = hist(1995).toDF("bin", "ca")
    val b = hist(1996).toDF("bin", "cb")
    val grid = a.join(b, Seq("bin"), "full")
      .na.fill(0L, Seq("ca", "cb"))
      .localCheckpoint(true)
    val tots = grid.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    val shares = grid.crossJoin(broadcast(tots))
      .select($"bin",
        expr("(ca * 1000000000) div na").as("pa_fp"),
        expr("(cb * 1000000000) div nb").as("pb_fp"))
    val w = Window.orderBy($"bin")
    shares
      .select($"bin", sum($"pa_fp" - $"pb_fp").over(w).as("cdiff"))
      .agg(sum(abs($"cdiff")).as("w1_fp"))
      .select($"w1_fp",
        expr(s"CAST(floor(CAST(w1_fp AS DOUBLE) / 1000000000.0" +
          s" * $W1BinDollars * 100 + 0.5) AS BIGINT)").as("w1_cents"))
  }

  private val wassersteinOracle =
    s"""WITH a AS (
       |  SELECT CAST(floor(o_totalprice / $W1BinDollars) AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS ca
       |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
       |b AS (
       |  SELECT CAST(floor(o_totalprice / $W1BinDollars) AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS cb
       |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
       |grid AS (
       |  SELECT COALESCE(a.bin, b.bin) AS bin, COALESCE(ca, 0) AS ca,
       |         COALESCE(cb, 0) AS cb
       |  FROM a FULL JOIN b ON a.bin = b.bin),
       |tots AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |                CAST(sum(cb) AS BIGINT) AS nb FROM grid),
       |shares AS (
       |  SELECT bin, (ca * 1000000000) // na AS pa_fp,
       |         (cb * 1000000000) // nb AS pb_fp
       |  FROM grid, tots),
       |cum AS (
       |  SELECT bin, CAST(sum(pa_fp - pb_fp) OVER (ORDER BY bin) AS BIGINT) AS cdiff
       |  FROM shares)
       |SELECT CAST(sum(abs(cdiff)) AS BIGINT) AS w1_fp,
       |       CAST(floor(CAST(sum(abs(cdiff)) AS DOUBLE) / 1000000000.0
       |         * $W1BinDollars * 100 + 0.5) AS BIGINT) AS w1_cents
       |FROM cum""".stripMargin

  // ---------------------------------------------------------------- x206

  /** Holt smoothing weights: α = β = 1/4 (dyadic so the recursion is
    * integer-exact after one shared floor per step). */

  /** x206: Holt double exponential smoothing (level + trend) backtest —
    * the trend-aware upgrade of q88's EWMA and the model q110's
    * seasonal-naive baseline competes against. Train on the daily
    * revenue series through 1997, then forecast every 1998 day as
    * l + h·b from the FINAL train state (a true out-of-sample
    * multi-horizon test, no peeking). The recursion
    * l′ = ⌊(y + 3(l+b))/4⌋, b′ = ⌊((l′−l) + 3b)/4⌋ runs on exact
    * integers; the one floor per step uses floor(double/4.0) in BOTH
    * engines because Spark's `div` truncates toward zero while
    * DuckDB's `//` floors — they disagree exactly on the negative
    * trend values this recursion produces. Spark folds the train
    * array with `aggregate` (final state only, O(1) accumulator);
    * DuckDB walks the same grid with a recursive CTE.
    *
    * Scale: the data-sized work is one date-grain aggregate; the fold
    * input is the ~1.1k-day train series on one task, the holdout
    * projection a broadcast of a 2-value state. */
  def holtBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"),
        year($"o_orderdate").as("yr"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
      .localCheckpoint(true)
    val state = daily.filter($"yr" <= 1997)
      .agg(sort_array(collect_list(struct($"di", $"y"))).as("rows"))
      .select(expr(
        """aggregate(rows,
          |  named_struct('l', CAST(-1 AS BIGINT), 'b', CAST(0 AS BIGINT),
          |               'di', CAST(0 AS BIGINT), 'y', CAST(0 AS BIGINT)),
          |  (acc, r) -> CASE WHEN acc.l = -1
          |    THEN named_struct('l', r.y, 'b', CAST(0 AS BIGINT), 'di', r.di, 'y', r.y)
          |    ELSE named_struct(
          |      'l', CAST(floor(CAST(r.y + 3 * (acc.l + acc.b) AS DOUBLE) / 4.0) AS BIGINT),
          |      'b', CAST(floor(CAST((CAST(floor(CAST(r.y + 3 * (acc.l + acc.b) AS DOUBLE) / 4.0) AS BIGINT) - acc.l) + 3 * acc.b AS DOUBLE) / 4.0) AS BIGINT),
          |      'di', r.di, 'y', r.y) END)
          |""".stripMargin).as("s"))
      .select($"s.l".as("l"), $"s.b".as("b"), $"s.di".as("last_di"),
        $"s.y".as("y_last"))
    daily.filter($"yr" === 1998)
      .crossJoin(broadcast(state))
      .select($"di", $"y",
        ($"l" + ($"di" - $"last_di") * $"b").as("f_holt"),
        $"y_last".as("f_naive"),
        abs($"y" - ($"l" + ($"di" - $"last_di") * $"b")).as("err_holt"),
        abs($"y" - $"y_last").as("err_naive"))
      .orderBy($"di")
  }

  private val holtOracle =
    """WITH RECURSIVE daily AS MATERIALIZED (
      |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |              AS BIGINT) AS di,
      |         year(o_orderdate) AS yr,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |train AS MATERIALIZED (
      |  SELECT di, y, CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS i
      |  FROM daily WHERE yr <= 1997),
      |n0 AS (SELECT max(i) AS nmax FROM train),
      |walk AS (
      |  SELECT i, y AS l, CAST(0 AS BIGINT) AS b, di, y FROM train WHERE i = 1
      |  UNION ALL
      |  SELECT t.i,
      |         CAST(floor(CAST(t.y + 3 * (w.l + w.b) AS DOUBLE) / 4.0) AS BIGINT),
      |         CAST(floor(CAST((CAST(floor(CAST(t.y + 3 * (w.l + w.b) AS DOUBLE) / 4.0) AS BIGINT) - w.l) + 3 * w.b AS DOUBLE) / 4.0) AS BIGINT),
      |         t.di, t.y
      |  FROM train t JOIN walk w ON t.i = w.i + 1),
      |state AS (
      |  SELECT w.l, w.b, w.di AS last_di, w.y AS y_last
      |  FROM walk w, n0 WHERE w.i = n0.nmax)
      |SELECT d.di, d.y,
      |       s.l + (d.di - s.last_di) * s.b AS f_holt,
      |       s.y_last AS f_naive,
      |       abs(d.y - (s.l + (d.di - s.last_di) * s.b)) AS err_holt,
      |       abs(d.y - s.y_last) AS err_naive
      |FROM daily d, state s WHERE d.yr = 1998
      |ORDER BY d.di""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x204_isotonic",
      "isotonic calibration of urgent-rate vs order value via the exact minimax identity over quantized interval averages",
      isotonic, Some(isotonicOracle)),
    QueryDef("x205_wasserstein",
      "1-D Wasserstein-1 distance between 1995 and 1996 order-value histograms: integer shares, one cumulative window, dollar-scaled",
      wasserstein, Some(wassersteinOracle)),
    QueryDef("x206_holt_backtest",
      "Holt level+trend smoothing trained through 1997, multi-horizon 1998 backtest vs last-value naive, exact-integer recursion",
      holtBacktest, Some(holtOracle)))
}
