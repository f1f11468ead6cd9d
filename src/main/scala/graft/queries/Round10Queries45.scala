package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-fifth tier: multi-changepoint detection by binary
  * segmentation (x220) and the ABC/XYZ inventory classification matrix
  * (x221). */
object Round10Queries45 {

  /** Minimum segment length either side of a split. */
  private val MinSeg = 30

  // ---------------------------------------------------------------- x220

  /** x220: binary-segmentation changepoints on daily revenue — q60's
    * CUSUM finds ONE shift; binary segmentation recurses: the best
    * split τ maximizes the SSE reduction
    * R(τ) = SSE[1,n] − SSE[1,τ] − SSE[τ+1,n], then each half is split
    * again (three changepoints total). All SSE terms come from two
    * prefix sums over whole-dollar integers; the gain is a ratio of
    * exact integers evaluated identically in both engines, so the
    * argmax (gain DESC, τ ASC) is engine-stable WITHOUT rounding the
    * ranking key (the r7 rule: never quantize an argmin/argmax key).
    * Publishes root/left/right splits with 1e-2-quantized gains.
    *
    * Scale: one date-grain aggregate, one prefix-sum window, three
    * rank-1 window passes over the ~1.1k-row candidate frame — the
    * recursion depth is fixed, not data-dependent. */
  def binsegChangepoints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") <= 1997)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).as("y"))
    val w = Window.orderBy($"di")
    val pre = daily.select($"di", $"y",
      row_number().over(w).cast("long").as("i"),
      sum($"y").over(w).as("p1"), sum($"y" * $"y").over(w).as("p2"))
      .localCheckpoint(true)
    val nRow = pre.agg(max($"i").as("n"), max($"p1").as("t1"),
      max($"p2").as("t2"))
    val rootGain =
      "(CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)" +
        " / CAST(n AS DOUBLE))" +
        " - (CAST(p2 AS DOUBLE) - CAST(p1 AS DOUBLE) * CAST(p1 AS DOUBLE)" +
        " / CAST(i AS DOUBLE))" +
        " - (CAST(t2 - p2 AS DOUBLE) - CAST(t1 - p1 AS DOUBLE)" +
        " * CAST(t1 - p1 AS DOUBLE) / CAST(n - i AS DOUBLE))"
    val root = pre.crossJoin(broadcast(nRow))
      .filter($"i" >= MinSeg && $"i" <= $"n" - MinSeg)
      .withColumn("gain", expr(rootGain))
      .withColumn("rk", row_number().over(Window.orderBy($"gain".desc, $"i")))
      .filter($"rk" === 1)
      .select($"i".as("tau_i"), $"di".as("tau_di"), $"gain")
      .localCheckpoint(true)
    // pp adds the virtual zero prefix so lo-1 = 0 resolves.
    val pp = pre.select($"i", $"p1", $"p2")
      .unionByName(spark.range(1).select(lit(0L).as("i"), lit(0L).as("p1"),
        lit(0L).as("p2")))
    // Two child segments [1, tau] and [tau+1, n], bounds joined from pp.
    val seg = root.crossJoin(broadcast(nRow))
      .select(explode(array(
        struct(lit("left").as("side"), lit(1L).as("lo"), $"tau_i".as("hi")),
        struct(lit("right").as("side"), ($"tau_i" + 1L).as("lo"),
          $"n".as("hi")))).as("s"))
      .select($"s.side".as("side"), $"s.lo".as("lo"), $"s.hi".as("hi"))
    val bounds = seg
      .join(pp.toDF("ilo", "b1", "b2"), $"ilo" === $"lo" - 1)
      .join(pp.toDF("ihi", "e1", "e2"), $"ihi" === $"hi")
      .select($"side", $"lo", $"hi", $"b1", $"b2", $"e1", $"e2")
    val childGain =
      "(CAST(e2 - b2 AS DOUBLE) - CAST(e1 - b1 AS DOUBLE)" +
        " * CAST(e1 - b1 AS DOUBLE) / CAST(hi - lo + 1 AS DOUBLE))" +
        " - (CAST(p2 - b2 AS DOUBLE) - CAST(p1 - b1 AS DOUBLE)" +
        " * CAST(p1 - b1 AS DOUBLE) / CAST(i - lo + 1 AS DOUBLE))" +
        " - (CAST(e2 - p2 AS DOUBLE) - CAST(e1 - p1 AS DOUBLE)" +
        " * CAST(e1 - p1 AS DOUBLE) / CAST(hi - i AS DOUBLE))"
    val children = pre.join(broadcast(bounds),
        $"i" >= $"lo" + (MinSeg - 1) && $"i" <= $"hi" - MinSeg)
      .withColumn("gain", expr(childGain))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"side").orderBy($"gain".desc, $"i")))
      .filter($"rk" === 1)
      .select($"side".as("phase"), $"di".as("tau_di"), $"gain")
    val childOut = children
      .select($"phase", $"tau_di",
        expr("CAST(floor(gain * 100 + 0.5) AS BIGINT)").as("gain_d100"))
    root.select(lit("root").as("phase"), $"tau_di",
        expr("CAST(floor(gain * 100 + 0.5) AS BIGINT)").as("gain_d100"))
      .unionByName(childOut)
      .orderBy($"phase")
  }

  private val binsegOracle = {
    val g = "(CAST(phi.p2 - plo.p2 AS DOUBLE) - CAST(phi.p1 - plo.p1 AS DOUBLE)" +
      " * CAST(phi.p1 - plo.p1 AS DOUBLE) / CAST(seg.hi - seg.lo + 1 AS DOUBLE))" +
      " - (CAST(c.p2 - plo.p2 AS DOUBLE) - CAST(c.p1 - plo.p1 AS DOUBLE)" +
      " * CAST(c.p1 - plo.p1 AS DOUBLE) / CAST(c.i - seg.lo + 1 AS DOUBLE))" +
      " - (CAST(phi.p2 - c.p2 AS DOUBLE) - CAST(phi.p1 - c.p1 AS DOUBLE)" +
      " * CAST(phi.p1 - c.p1 AS DOUBLE) / CAST(seg.hi - c.i AS DOUBLE))"
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders WHERE year(o_orderdate) <= 1997 GROUP BY 1),
       |p AS MATERIALIZED (
       |  SELECT di, y, CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS i,
       |         CAST(sum(y) OVER (ORDER BY di) AS BIGINT) AS p1,
       |         CAST(sum(y * y) OVER (ORDER BY di) AS BIGINT) AS p2
       |  FROM daily),
       |pp AS MATERIALIZED (SELECT i, p1, p2 FROM p
       |                    UNION ALL SELECT 0, 0, 0),
       |nn AS (SELECT max(i) AS n, max(p1) AS t1, max(p2) AS t2 FROM p),
       |root AS MATERIALIZED (
       |  SELECT i AS tau_i, di AS tau_di, gain FROM (
       |    SELECT c.i, c.di,
       |           (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
       |              / CAST(n AS DOUBLE))
       |         - (CAST(c.p2 AS DOUBLE) - CAST(c.p1 AS DOUBLE) * CAST(c.p1 AS DOUBLE)
       |              / CAST(c.i AS DOUBLE))
       |         - (CAST(t2 - c.p2 AS DOUBLE) - CAST(t1 - c.p1 AS DOUBLE)
       |              * CAST(t1 - c.p1 AS DOUBLE) / CAST(n - c.i AS DOUBLE)) AS gain
       |    FROM p c, nn
       |    WHERE c.i >= $MinSeg AND c.i <= n - $MinSeg) t
       |  ORDER BY gain DESC, tau_i LIMIT 1),
       |segs AS (
       |  SELECT 'left' AS side, CAST(1 AS BIGINT) AS lo, r.tau_i AS hi FROM root r
       |  UNION ALL
       |  SELECT 'right', r.tau_i + 1, nn.n FROM root r, nn),
       |child AS (
       |  SELECT side, tau_di, gain FROM (
       |    SELECT seg.side AS side, c.di AS tau_di, c.i,
       |           $g AS gain,
       |           row_number() OVER (PARTITION BY seg.side
       |             ORDER BY $g DESC, c.i) AS rk
       |    FROM segs seg
       |    JOIN pp plo ON plo.i = seg.lo - 1
       |    JOIN pp phi ON phi.i = seg.hi
       |    JOIN p c ON c.i >= seg.lo + ${MinSeg - 1}
       |            AND c.i <= seg.hi - $MinSeg) t
       |  WHERE rk = 1)
       |SELECT phase, tau_di, CAST(floor(gain * 100 + 0.5) AS BIGINT) AS gain_d100
       |FROM (
       |  SELECT 'root' AS phase, tau_di, gain FROM root
       |  UNION ALL SELECT side, tau_di, gain FROM child) u
       |ORDER BY phase""".stripMargin
  }

  // ---------------------------------------------------------------- x221

  /** XYZ coefficient-of-variation thresholds (1e-6 fixed point). */
  private val XThr = 500000L
  private val YThr = 1000000L

  /** x221: ABC/XYZ classification of parts — the inventory-planning
    * matrix: ABC by cumulative revenue share (A = first 80%, B = next
    * 15%, C = tail) over the revenue-ranked parts, XYZ by demand
    * variability (monthly-quantity coefficient of variation: X ≤ 0.5,
    * Y ≤ 1.0, else Z). Revenue ranks come from one ordered prefix sum;
    * the CV is exact integer moments + one IEEE sqrt quantized to 1e-6
    * BEFORE the class comparison (so the class boundary compares
    * integers). Publishes the 9-cell matrix with part counts and
    * revenue share per cell.
    *
    * Scale: two part-grain aggregates from lineitem (map-side
    * combined); the rank/prefix window runs on part-grain rows (the
    * q63 Pareto pattern). */
  def abcXyz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_partkey".as("pk"),
      floor($"l_extendedprice" * (lit(1.0) - $"l_discount") + 0.5)
        .cast("long").as("rev"),
      floor($"l_quantity" + 0.5).cast("long").as("qty"),
      (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mo"))
    val rev = li.groupBy($"pk").agg(sum($"rev").as("rev"))
    val wR = Window.orderBy($"rev".desc, $"pk")
    val tot = rev.agg(sum($"rev").as("trev"))
    val abc = rev.withColumn("crev", sum($"rev").over(
        wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select($"pk", $"rev",
        expr("CASE WHEN (crev - rev) * 100 < trev * 80 THEN 'A'" +
          " WHEN (crev - rev) * 100 < trev * 95 THEN 'B'" +
          " ELSE 'C' END").as("abc"))
    val monthly = li.groupBy($"pk", $"mo").agg(sum($"qty").as("q"))
    val xyz = monthly.groupBy($"pk")
      .agg(count(lit(1)).as("nm"), sum($"q").as("sq"),
        sum($"q" * $"q").as("sqq"))
      .select($"pk",
        expr("CAST(floor(sqrt(greatest(CAST(nm AS DOUBLE) * CAST(sqq AS DOUBLE)" +
          " - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE), 0.0))" +
          " / CAST(sq AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("cv_fp"))
      .select($"pk",
        when($"cv_fp" <= XThr, "X").when($"cv_fp" <= YThr, "Y")
          .otherwise("Z").as("xyz"))
    abc.join(xyz, "pk")
      .crossJoin(broadcast(tot))
      .groupBy($"abc", $"xyz")
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(floor(CAST(sum(rev) AS DOUBLE) / CAST(max(trev) AS DOUBLE)" +
          " * 1000000 + 0.5) AS BIGINT)").as("rev_share_fp"))
      .orderBy($"abc", $"xyz")
  }

  private val abcXyzOracle =
    s"""WITH li AS MATERIALIZED (
       |  SELECT l_partkey AS pk,
       |         CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5) AS BIGINT)
       |           AS rev,
       |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
       |         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mo
       |  FROM lineitem),
       |rev AS MATERIALIZED (SELECT pk, CAST(sum(rev) AS BIGINT) AS rev
       |                     FROM li GROUP BY pk),
       |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS trev FROM rev),
       |abc AS (
       |  SELECT pk, rev,
       |         CASE WHEN (crev - rev) * 100 < trev * 80 THEN 'A'
       |              WHEN (crev - rev) * 100 < trev * 95 THEN 'B'
       |              ELSE 'C' END AS abc
       |  FROM (SELECT pk, rev,
       |          CAST(sum(rev) OVER (ORDER BY rev DESC, pk) AS BIGINT) AS crev
       |        FROM rev) r, tot),
       |monthly AS (SELECT pk, mo, CAST(sum(qty) AS BIGINT) AS q
       |            FROM li GROUP BY pk, mo),
       |xyz AS (
       |  SELECT pk, CASE WHEN cv_fp <= $XThr THEN 'X'
       |                  WHEN cv_fp <= $YThr THEN 'Y' ELSE 'Z' END AS xyz
       |  FROM (SELECT pk,
       |          CAST(floor(sqrt(greatest(CAST(nm AS DOUBLE) * CAST(sqq AS DOUBLE)
       |            - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE), 0.0))
       |            / CAST(sq AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS cv_fp
       |        FROM (SELECT pk, CAST(count(*) AS BIGINT) AS nm,
       |                     CAST(sum(q) AS BIGINT) AS sq,
       |                     CAST(sum(q * q) AS BIGINT) AS sqq
       |              FROM monthly GROUP BY pk) m) c)
       |SELECT a.abc, x.xyz, CAST(count(*) AS BIGINT) AS n_parts,
       |       CAST(floor(CAST(sum(a.rev) AS DOUBLE) / CAST(max(t.trev) AS DOUBLE)
       |         * 1000000 + 0.5) AS BIGINT) AS rev_share_fp
       |FROM abc a JOIN xyz x ON x.pk = a.pk, tot t
       |GROUP BY a.abc, x.xyz
       |ORDER BY a.abc, x.xyz""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x220_binseg",
      "binary-segmentation changepoints (root + both halves) on daily revenue: prefix-sum SSE gains, unrounded argmax keys",
      binsegChangepoints, Some(binsegOracle)),
    QueryDef("x221_abc_xyz",
      "ABC/XYZ part classification: cumulative revenue share classes x monthly-demand CV classes, 9-cell matrix with shares",
      abcXyz, Some(abcXyzOracle)))
}
