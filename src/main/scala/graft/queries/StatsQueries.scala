package graft.queries

import graft.{QueryDef, Tables}
import graft.queries.QueryUtil.halfUp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-testing tier — the hypothesis tests an analytics team runs
  * on top of the warehouse: Welch's two-sample t-test, the Mann-Kendall
  * trend test, Spearman rank correlation, and a Hampel rolling-MAD
  * outlier filter. All follow the exact-moment recipe (q70): counts,
  * cents, ranks, and cross moments stay integral (long / decimal(38,0)
  * == DuckDB HUGEINT) until one final double conversion; the only
  * floating ops are divisions and IEEE-exact sqrt on bit-identical
  * inputs, so the distributed Spark result and the sequential DuckDB
  * oracle agree to the bit before rounding.
  *
  * Scale: every test statistic is computed on a tiny aggregate frame
  * (3 groups, 25 nations, 25x~80 months) — the full scan contributes
  * exactly one partial-aggregated pass; the pairwise joins (Mann-Kendall)
  * run on the aggregate, never the raw table. */
object StatsQueries {

  private val dec = "decimal(38,0)"

  /** Hampel threshold |x-med| > 3*1.4826*MAD as the exact integer
    * predicate |x-med|*10000 > 44478*MAD (3*1.4826 = 4.4478). */
  private val HampelScaled = 44478L

  /** q75: Welch's unequal-variance t-test — per return flag, does the
    * mean extended price (exact cents) differ between open (O) and
    * finished (F) line statuses? Moments Σy (long), Σy² (decimal) are
    * exact; sample variance v = (n·Σy² − (Σy)²) / (n·(n−1)) is an exact
    * integer ratio divided once; t and the Welch–Satterthwaite df are
    * pure double arithmetic in the same association order as the oracle.
    * Scale: one 6-row aggregate over the scan; the t math runs on a
    * 3-row join of that aggregate. */
  def welchTTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir).select(
      $"l_returnflag".as("grp"), $"l_linestatus".as("s"),
      floor($"l_extendedprice" * 100 + 0.5).cast("long").as("y"))
    val m = base.groupBy($"grp", $"s")
      .agg(count(lit(1)).as("n"), sum($"y").as("sy"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("qy"))
    def vOf(n: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
            qy: org.apache.spark.sql.Column) =
      (n.cast(dec) * qy - sy.cast(dec) * sy.cast(dec)).cast("double") /
        (n.cast(dec) * (n - 1).cast(dec)).cast("double")
    val a = m.filter($"s" === "O").select($"grp", $"n".as("n1"),
      ($"sy".cast("double") / $"n".cast("double")).as("m1"),
      vOf($"n", $"sy", $"qy").as("v1"))
    val b = m.filter($"s" === "F").select($"grp", $"n".as("n2"),
      ($"sy".cast("double") / $"n".cast("double")).as("m2"),
      vOf($"n", $"sy", $"qy").as("v2"))
    val se2 = $"v1" / $"n1" + $"v2" / $"n2"
    a.join(b, Seq("grp"))
      .select($"grp".as("l_returnflag"), $"n1", $"n2",
        halfUp(($"m1" - $"m2") * 100, 0).as("mean_diff_x100"),
        halfUp(($"m1" - $"m2") / sqrt(se2), 4).as("t_stat"),
        halfUp(se2 * se2 /
          (($"v1" / $"n1") * ($"v1" / $"n1") / ($"n1" - 1) +
           ($"v2" / $"n2") * ($"v2" / $"n2") / ($"n2" - 1)), 2).as("df"))
      .orderBy("l_returnflag")
  }

  private val welchTTestOracle =
    """WITH base AS (
      |  SELECT l_returnflag AS grp, l_linestatus AS s,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT grp, s, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
      |         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS qy
      |  FROM base GROUP BY grp, s),
      |w AS (
      |  SELECT a.grp, a.n AS n1, b.n AS n2,
      |         CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
      |         CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
      |         CAST(CAST(a.n AS HUGEINT) * a.qy - CAST(a.sy AS HUGEINT) * CAST(a.sy AS HUGEINT) AS DOUBLE)
      |           / CAST(CAST(a.n AS HUGEINT) * CAST(a.n - 1 AS HUGEINT) AS DOUBLE) AS v1,
      |         CAST(CAST(b.n AS HUGEINT) * b.qy - CAST(b.sy AS HUGEINT) * CAST(b.sy AS HUGEINT) AS DOUBLE)
      |           / CAST(CAST(b.n AS HUGEINT) * CAST(b.n - 1 AS HUGEINT) AS DOUBLE) AS v2
      |  FROM m a JOIN m b ON a.grp = b.grp AND a.s = 'O' AND b.s = 'F')
      |SELECT grp AS l_returnflag, n1, n2,
      |       floor((m1 - m2) * 100 + 0.5) AS mean_diff_x100,
      |       floor(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) * 10000 + 0.5) / 10000.0 AS t_stat,
      |       floor(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
      |              / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))) * 100 + 0.5) / 100.0 AS df
      |FROM w ORDER BY l_returnflag""".stripMargin

  /** The (nation, month, count) order series shared by q76/q78's shape:
    * one aggregated pass over orders⋈customer⋈nation (both dims are
    * broadcast joins; the group-by is the only shuffle). */
  private def monthlySeries(spark: SparkSession, dir: String,
                            value: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
    value(o)
  }

  /** q76: Mann-Kendall trend test — per nation, is the monthly order
    * count trending? S = Σ_{i<j} sign(x_j − x_i) and the tie-corrected
    * variance (×18 to stay integral) are exact integers; only the final
    * z-score divides/sqrts. Scale: the O(m²) pair join runs on the
    * 25×~80-row MONTHLY AGGREGATE (≤3.2k pairs/nation), never the raw
    * orders table — the classic trick that makes pairwise statistics
    * feasible at 100 TB. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Reuse point (r8 pattern): the tiny narrow series aggregate has FOUR
    // consumers (both self-join sides, n, ties) — an explicit hash
    // repartition on the key makes the four subtrees identical so one
    // exchange feeds all of them (ReusedExchange / AQE stage cache)
    // instead of four re-scans of orders⋈customer⋈nation.
    val series = monthlySeries(spark, dir, o => o
      .groupBy($"n_name", trunc($"o_orderdate", "month").as("m"))
      .agg(count(lit(1)).as("x")))
      .repartition($"n_name")
    val s = series.as("a").join(series.as("b"),
        $"a.n_name" === $"b.n_name" && $"a.m" < $"b.m")
      .groupBy($"a.n_name".as("n_name"))
      .agg(sum(signum($"b.x" - $"a.x").cast("long")).as("s_stat"))
    val n = series.groupBy($"n_name").agg(count(lit(1)).as("n_months"))
    val ties = series.groupBy($"n_name", $"x").agg(count(lit(1)).as("t"))
      .groupBy($"n_name")
      .agg(sum($"t" * ($"t" - 1) * (lit(2) * $"t" + 5)).as("tie_adj"))
    val var18 = $"n_months" * ($"n_months" - 1) *
      (lit(2) * $"n_months" + 5) - $"tie_adj"
    n.join(s, Seq("n_name")).join(ties, Seq("n_name"))
      .select($"n_name", $"n_months", $"s_stat", var18.as("var18"),
        when($"s_stat" === 0, lit(0.0)).otherwise(
          halfUp(($"s_stat" - when($"s_stat" > 0, 1).otherwise(-1)) /
            sqrt(var18.cast("double") / 18.0), 4)).as("z"))
      .orderBy("n_name")
  }

  private val mannKendallOracle =
    """WITH series AS (
      |  SELECT n_name, date_trunc('month', o_orderdate) AS m, count(*) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, date_trunc('month', o_orderdate)),
      |s AS (
      |  SELECT a.n_name,
      |         CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM series a JOIN series b ON a.n_name = b.n_name AND a.m < b.m
      |  GROUP BY a.n_name),
      |n AS (SELECT n_name, count(*) AS n_months FROM series GROUP BY n_name),
      |ties AS (
      |  SELECT n_name, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
      |  FROM (SELECT n_name, x, count(*) AS t FROM series GROUP BY n_name, x)
      |  GROUP BY n_name)
      |SELECT n.n_name, n.n_months, s.s_stat,
      |       n.n_months * (n.n_months - 1) * (2 * n.n_months + 5) - ties.tie_adj AS var18,
      |       CASE WHEN s.s_stat = 0 THEN 0.0
      |            ELSE floor(((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1 ELSE -1 END)
      |                 / sqrt(CAST(n.n_months * (n.n_months - 1) * (2 * n.n_months + 5) - ties.tie_adj AS DOUBLE) / 18.0)) * 10000 + 0.5) / 10000.0 END AS z
      |FROM n JOIN s USING (n_name) JOIN ties USING (n_name)
      |ORDER BY n_name""".stripMargin

  /** q77: Spearman rank correlation — per nation, do customers with
    * higher account balances place more orders? Average ranks with ties
    * are kept integral as 2·rank: 2·rank() + count(ties) − 1 (min-rank
    * window + tie-count window, both engines' rank() semantics agree);
    * then Pearson on the doubled ranks from exact decimal moments —
    * n·Σxy − Σx·Σy over sqrt of the exact product of the two variance
    * numerators. Scale: two window passes over customers partitioned by
    * nation + one aggregate; the rank windows are the same
    * partition-sort shape q07/q23 already run. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ocnt = Tables.orders(spark, dir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
    val cust = Tables.customer(spark, dir)
      .join(ocnt, $"c_custkey" === $"o_custkey", "left")
      .select($"c_nationkey",
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("bal"),
        coalesce($"cnt", lit(0L)).as("ocnt"))
    def rank2(v: String) =
      lit(2) * rank().over(Window.partitionBy($"c_nationkey").orderBy(col(v))) +
        count(lit(1)).over(Window.partitionBy($"c_nationkey", col(v))) - 1
    val ranked = cust.select($"c_nationkey",
      rank2("bal").as("rx"), rank2("ocnt").as("ry"))
    val m = ranked.groupBy($"c_nationkey").agg(count(lit(1)).as("n"),
      sum($"rx").cast(dec).as("sx"), sum($"ry").cast(dec).as("sy"),
      sum($"rx".cast(dec) * $"ry".cast(dec)).as("sxy"),
      sum($"rx".cast(dec) * $"rx".cast(dec)).as("sxx"),
      sum($"ry".cast(dec) * $"ry".cast(dec)).as("syy"))
    m.join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"n".as("n_cust"),
        halfUp(($"n".cast(dec) * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt((($"n".cast(dec) * $"sxx" - $"sx" * $"sx") *
                ($"n".cast(dec) * $"syy" - $"sy" * $"sy")).cast("double")), 4)
          .as("rho"))
      .orderBy("n_name")
  }

  private val spearmanOracle =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
      |         COALESCE(o.cnt, 0) AS ocnt
      |  FROM customer LEFT JOIN (SELECT o_custkey, count(*) AS cnt
      |                           FROM orders GROUP BY o_custkey) o
      |    ON c_custkey = o_custkey),
      |ranked AS (
      |  SELECT c_nationkey,
      |         2 * rank() OVER (PARTITION BY c_nationkey ORDER BY bal)
      |           + count(*) OVER (PARTITION BY c_nationkey, bal) - 1 AS rx,
      |         2 * rank() OVER (PARTITION BY c_nationkey ORDER BY ocnt)
      |           + count(*) OVER (PARTITION BY c_nationkey, ocnt) - 1 AS ry
      |  FROM cust),
      |m AS (
      |  SELECT c_nationkey, count(*) AS n,
      |         CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
      |         sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
      |         sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
      |         sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
      |  FROM ranked GROUP BY c_nationkey)
      |SELECT n_name, n AS n_cust,
      |       floor((CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
      |              / sqrt(CAST((CAST(n AS HUGEINT) * sxx - sx * sx)
      |                          * (CAST(n AS HUGEINT) * syy - sy * sy) AS DOUBLE))) * 10000 + 0.5) / 10000.0 AS rho
      |FROM m JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin

  /** q78: Hampel filter — per nation, monthly revenue (exact cents) with
    * a centered rolling-7 median and MAD; a month is an outlier when
    * |x − med| > 3·1.4826·MAD, evaluated as the EXACT integer predicate
    * |x − med|·10000 > 44478·MAD (no float epsilon). Median and MAD of 7
    * exact longs are order statistics (sorted-array element 4), identical
    * in both engines; incomplete edge windows are excluded so the count
    * is always odd. Scale: the rolling window runs over the ~80-row
    * monthly aggregate per nation — a 7-element collect per row of a
    * TINY frame, not the raw table. */
  def hampel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val series = monthlySeries(spark, dir, o => o
      .groupBy($"n_name", trunc($"o_orderdate", "month").as("m"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("rev")))
    val w7 = Window.partitionBy($"n_name").orderBy($"m").rowsBetween(-3, 3)
    val win = series.select($"n_name", $"m", $"rev",
      sort_array(collect_list($"rev").over(w7)).as("w"),
      count(lit(1)).over(w7).as("wn"))
    win.filter($"wn" === 7)
      .withColumn("med", element_at($"w", 4))
      .withColumn("mad",
        element_at(sort_array(transform($"w", y => abs(y - $"med"))), 4))
      .select($"n_name", date_format($"m", "yyyy-MM-dd").as("month"),
        $"rev", $"med", $"mad",
        (abs($"rev" - $"med") * 10000 > lit(HampelScaled) * $"mad")
          .cast("int").as("is_outlier"))
      .orderBy("n_name", "month")
  }

  private val hampelOracle =
    s"""WITH series AS (
       |  SELECT n_name, date_trunc('month', o_orderdate) AS m,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY n_name, date_trunc('month', o_orderdate)),
       |win AS (
       |  SELECT n_name, m, rev,
       |         list_sort(list(rev) OVER (PARTITION BY n_name ORDER BY m
       |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w,
       |         count(*) OVER (PARTITION BY n_name ORDER BY m
       |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
       |  FROM series),
       |scored AS (
       |  SELECT n_name, m, rev, w[4] AS med,
       |         list_sort(list_transform(w, y -> abs(y - w[4])))[4] AS mad
       |  FROM win WHERE wn = 7)
       |SELECT n_name, strftime(CAST(m AS DATE), '%Y-%m-%d') AS month, rev, med, mad,
       |       CASE WHEN abs(rev - med) * 10000 > $HampelScaled * mad THEN 1 ELSE 0 END AS is_outlier
       |FROM scored ORDER BY n_name, month""".stripMargin

  /** q79: Mann-Whitney U — the nonparametric counterpart of q75: per
    * return flag, are open-vs-finished discount distributions shifted?
    * Combined-sample average ranks stay integral as 2·rank (the q77
    * trick); U×2 = R1×2 − 2·n1(n1+1)/2 is exact; the tie-corrected
    * variance is an exact decimal ratio (Σt³−t correction) divided and
    * sqrt'ed once. Scale: one rank window over the combined sample (the
    * q07/q23 partition-sort shape), one tie aggregate — both on the scan,
    * no pairwise work at all (the rank-sum identity is what makes U
    * feasible where naive pair counting is O(n²)). */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mannWhitneyStat(Tables.lineitem(spark, dir).select(
      $"l_returnflag".as("grp"), $"l_linestatus".as("s"),
      floor($"l_discount" * 100 + 0.5).cast("long").as("y")))
      .select($"grp".as("l_returnflag"), $"n1", $"n2", $"u1_x2", $"z")
      .orderBy("l_returnflag")
  }

  /** The U core over ANY (grp: string, s: 'O'|'F', y: long) frame —
    * factored out so PropertySpec can race it against brute-force pair
    * counting (U1×2 = 2·wins + ties) on random fixtures. */
  private[graft] def mannWhitneyStat(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val ranked = base.select($"grp", $"s",
      (lit(2) * rank().over(Window.partitionBy($"grp").orderBy($"y")) +
        count(lit(1)).over(Window.partitionBy($"grp", $"y")) - 1).as("r2"))
    val agg = ranked.groupBy($"grp").agg(
      sum(when($"s" === "O", $"r2")).cast(dec).as("r1x2"),
      sum(when($"s" === "O", 1).otherwise(0)).cast(dec).as("n1"),
      sum(when($"s" === "F", 1).otherwise(0)).cast(dec).as("n2"))
    val ties = base.groupBy($"grp", $"y").agg(count(lit(1)).as("t"))
      .groupBy($"grp")
      .agg(sum($"t".cast(dec) * $"t" * $"t" - $"t").as("tie3"))
    val nTot = $"n1" + $"n2"
    agg.join(ties, Seq("grp"))
      .select($"grp",
        $"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
        ($"r1x2" - $"n1" * ($"n1" + 1)).cast("long").as("u1_x2"),
        halfUp((($"r1x2" - $"n1" * ($"n1" + 1)).cast("double") -
            ($"n1" * $"n2").cast("double")) /
          (lit(2.0) * sqrt(($"n1" * $"n2" *
              ((nTot + 1) * nTot * (nTot - 1) - $"tie3")).cast("double") /
            (lit(12.0) * (nTot * (nTot - 1)).cast("double")))), 4).as("z"))
  }

  private val mannWhitneyOracle =
    """WITH base AS (
      |  SELECT l_returnflag AS grp, l_linestatus AS s,
      |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |ranked AS (
      |  SELECT grp, s,
      |         2 * rank() OVER (PARTITION BY grp ORDER BY y)
      |           + count(*) OVER (PARTITION BY grp, y) - 1 AS r2
      |  FROM base),
      |agg AS (
      |  SELECT grp,
      |         CAST(sum(CASE WHEN s = 'O' THEN r2 END) AS HUGEINT) AS r1x2,
      |         CAST(sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
      |         CAST(sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS HUGEINT) AS n2
      |  FROM ranked GROUP BY grp),
      |ties AS (
      |  SELECT grp, CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie3
      |  FROM (SELECT grp, y, count(*) AS t FROM base GROUP BY grp, y) GROUP BY grp)
      |SELECT grp AS l_returnflag,
      |       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
      |       floor(((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
      |         / (2.0 * sqrt(CAST(n1 * n2 * ((n1 + n2 + 1) * (n1 + n2) * (n1 + n2 - 1) - tie3) AS DOUBLE)
      |                       / (12.0 * CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))))) * 10000 + 0.5) / 10000.0 AS z
      |FROM agg JOIN ties USING (grp) ORDER BY l_returnflag""".stripMargin

  /** q80: Kolmogorov-Smirnov two-sample test — per return flag, the
    * maximum ECDF gap between open and finished extended-price
    * distributions, kept EXACT: D's numerator max|n2·F1 − n1·F2| is an
    * integer maximum over the merged value spine (cumulative counts per
    * sample via one window), divided by n1·n2 once at the end. Scale:
    * grouping to the distinct-value spine first means the cumulative
    * window runs over |distinct values| rows, not raw rows; one sort per
    * group — the same shape as the exact-percentile rank-join family. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ksStat(Tables.lineitem(spark, dir).select(
      $"l_returnflag".as("grp"), $"l_linestatus".as("s"),
      floor($"l_extendedprice" * 100 + 0.5).cast("long").as("y")))
      .select($"grp".as("l_returnflag"), $"n1", $"n2", $"d_num", $"d_stat")
      .orderBy("l_returnflag")
  }

  /** The KS core over ANY (grp: string, s: 'O'|'F', y: long) frame —
    * factored out so PropertySpec can race the windowed ECDF-gap maximum
    * against a brute-force per-value scan on random fixtures. */
  private[graft] def ksStat(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val n = base.groupBy($"grp").agg(
      sum(when($"s" === "O", 1L).otherwise(0L)).as("n1"),
      sum(when($"s" === "F", 1L).otherwise(0L)).as("n2"))
    val pts = base.groupBy($"grp", $"y").agg(
      sum(when($"s" === "O", 1L).otherwise(0L)).as("c1"),
      sum(when($"s" === "F", 1L).otherwise(0L)).as("c2"))
    val wCum = Window.partitionBy($"grp").orderBy($"y")
    val cum = pts.select($"grp",
      sum($"c1").over(wCum).as("f1"), sum($"c2").over(wCum).as("f2"))
    cum.join(broadcast(n), Seq("grp"))
      .groupBy($"grp")
      .agg(max(abs($"n2" * $"f1" - $"n1" * $"f2")).as("d_num"),
        first($"n1").as("n1"), first($"n2").as("n2"))
      .select($"grp", $"n1", $"n2", $"d_num",
        halfUp($"d_num".cast("double") / ($"n1" * $"n2").cast("double"), 6)
          .as("d_stat"))
  }

  private val ksTestOracle =
    """WITH base AS (
      |  SELECT l_returnflag AS grp, l_linestatus AS s,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |n AS (SELECT grp,
      |        CAST(sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |        CAST(sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |      FROM base GROUP BY grp),
      |pts AS (
      |  SELECT grp, y,
      |        CAST(sum(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |        CAST(sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM base GROUP BY grp, y),
      |cum AS (
      |  SELECT grp, y,
      |         CAST(sum(c1) OVER (PARTITION BY grp ORDER BY y) AS BIGINT) AS f1,
      |         CAST(sum(c2) OVER (PARTITION BY grp ORDER BY y) AS BIGINT) AS f2
      |  FROM pts),
      |d AS (
      |  SELECT cum.grp, max(abs(n.n2 * cum.f1 - n.n1 * cum.f2)) AS d_num,
      |         first(n.n1) AS n1, first(n.n2) AS n2
      |  FROM cum JOIN n ON cum.grp = n.grp GROUP BY cum.grp)
      |SELECT grp AS l_returnflag, n1, n2, CAST(d_num AS BIGINT) AS d_num,
      |       floor((CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS d_stat
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** q82: Theil–Sen robust trend estimator — per order priority, the
    * median of all pairwise slopes (y_j − y_i)/(x_j − x_i) over the
    * monthly revenue series, plus the median-residual intercept. The
    * estimator has a 29.3% breakdown point, so unlike q70's OLS a few
    * wild months cannot drag the fitted trend.
    *
    * Cross-engine exactness: x is an integer month index, y exact cents;
    * each pairwise slope is ONE IEEE division of exact longs (correctly
    * rounded — bit-identical in Spark and DuckDB), the median is an
    * order-statistic pick (row_number over a total order with integer
    * tie-breaks, never a sum), and the two-middle average is a single
    * commutative double add. No libm, no accumulation-order dependence.
    *
    * Scale: the pairwise self-join runs on the (grp, month) AGGREGATE —
    * ≤ ~80 rows per group, ~3.2k pairs — never on raw orders; the raw
    * scan contributes exactly one partial-aggregated pass. At 1000× data
    * the aggregate frame is unchanged (the calendar doesn't grow with
    * SF beyond its 7-year span), so the quadratic stage is O(1). */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("grp"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).cast("long").as("x"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("yc"))
      .groupBy($"grp", $"x").agg(sum($"yc").as("y"))
    val a = pts.select($"grp", $"x".as("x1"), $"y".as("y1"))
    val b = pts.select($"grp", $"x".as("x2"), $"y".as("y2"))
    val pairs = a.join(b, Seq("grp")).filter($"x1" < $"x2")
      .select($"grp", ($"y2" - $"y1").as("dy"), ($"x2" - $"x1").as("dx"),
        $"x1",
        (($"y2" - $"y1").cast("double") / ($"x2" - $"x1").cast("double"))
          .as("slope"))
    val wS = Window.partitionBy($"grp").orderBy($"slope", $"dy", $"dx", $"x1")
    val ranked = pairs.select($"grp", $"slope",
      row_number().over(wS).as("rn"),
      count(lit(1)).over(Window.partitionBy($"grp")).as("np"))
    val med = ranked
      .filter($"rn" === floor(($"np" + 1) / 2) || $"rn" === floor(($"np" + 2) / 2))
      .groupBy($"grp").agg(avg($"slope").as("m"), first($"np").as("n_pairs"))
    val wR = Window.partitionBy($"grp").orderBy($"r", $"x")
    val resid = pts.join(med, Seq("grp"))
      .select($"grp", $"x", $"m", $"n_pairs",
        ($"y".cast("double") - $"m" * $"x".cast("double")).as("r"))
    val interc = resid
      .withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"grp")))
      .filter($"rn" === floor(($"n" + 1) / 2) || $"rn" === floor(($"n" + 2) / 2))
      .groupBy($"grp").agg(avg($"r").as("b0"), first($"n").as("n_points"),
        first($"m").as("m"), first($"n_pairs").as("n_pairs"))
    interc.select($"grp".as("o_orderpriority"),
      $"n_points".cast("long").as("n_points"),
      $"n_pairs".cast("long").as("n_pairs"),
      halfUp($"m", 6).as("ts_slope_cents_month"),
      halfUp($"b0", 2).as("ts_intercept_cents"))
      .orderBy("o_orderpriority")
  }

  private val theilSenOracle =
    """WITH pts AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.grp, b.y - a.y AS dy, b.x - a.x AS dx, a.x AS x1,
      |         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM pts a JOIN pts b ON a.grp = b.grp AND a.x < b.x),
      |ranked AS (
      |  SELECT grp, slope,
      |         row_number() OVER (PARTITION BY grp ORDER BY slope, dy, dx, x1) AS rn,
      |         count(*) OVER (PARTITION BY grp) AS np
      |  FROM pairs),
      |med AS (
      |  SELECT grp, avg(slope) AS m, first(np) AS n_pairs FROM ranked
      |  WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2 GROUP BY grp),
      |resid AS (
      |  SELECT pts.grp, pts.x, med.m, med.n_pairs,
      |         CAST(pts.y AS DOUBLE) - med.m * CAST(pts.x AS DOUBLE) AS r
      |  FROM pts JOIN med ON pts.grp = med.grp),
      |rr AS (
      |  SELECT grp, m, n_pairs, r,
      |         row_number() OVER (PARTITION BY grp ORDER BY r, x) AS rn,
      |         count(*) OVER (PARTITION BY grp) AS n
      |  FROM resid),
      |ic AS (
      |  SELECT grp, avg(r) AS b0, first(n) AS n_points, first(m) AS m,
      |         first(n_pairs) AS n_pairs
      |  FROM rr WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY grp)
      |SELECT grp AS o_orderpriority,
      |       CAST(n_points AS BIGINT) AS n_points,
      |       CAST(n_pairs AS BIGINT) AS n_pairs,
      |       floor(m * 1000000 + 0.5) / 1000000.0 AS ts_slope_cents_month,
      |       floor(b0 * 100 + 0.5) / 100.0 AS ts_intercept_cents
      |FROM ic ORDER BY o_orderpriority""".stripMargin

  /** ACF lag range (1..MaxLag). */
  private val MaxLag = 7

  /** q85: autocorrelation function — daily revenue (exact cents) ACF at
    * lags 1..7, the seasonality screen a forecasting pipeline runs before
    * model choice. The global mean never materializes as a float: with
    * S = Σy and n days, n²·r_k's numerator is Σ(n·y_t − S)(n·y_{t+k} − S)
    * and its denominator Σ(n·y_t − S)², both exact decimal(38,0)/HUGEINT
    * sums converted to double once for the final division. Calendar gaps
    * drop pairs (join on day index + k), identically in both engines.
    * Scale: one partial-aggregated scan to daily cents; everything after
    * runs on the ~2.4k-row series — the 7 lag joins are equi-joins on
    * the tiny frame with the totals broadcast. */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val c = daily.crossJoin(broadcast(tot))
      .select($"di", ($"n".cast(dec) * $"y".cast(dec) - $"s".cast(dec)).as("cy"))
    val den = c.agg(sum($"cy" * $"cy").as("dd"))
    val lags = spark.range(1, MaxLag + 1).select($"id".cast("long").as("lag"))
    val pairs = c.select($"di", $"cy").crossJoin(broadcast(lags))
      .join(c.select($"di".as("dj"), $"cy".as("cz")),
        $"dj" === $"di" + $"lag")
    pairs.groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"), sum($"cy" * $"cz").as("num"))
      .crossJoin(broadcast(den))
      .select($"lag", $"n_pairs",
        halfUp($"num".cast("double") / $"dd".cast("double"), 6).as("acf"))
      .orderBy("lag")
  }

  private val acfOracle =
    s"""WITH daily AS (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT count(*) AS n, sum(y) AS s FROM daily),
       |c AS (SELECT di, CAST(n AS HUGEINT) * y - s AS cy FROM daily, tot),
       |den AS (SELECT sum(cy * cy) AS dd FROM c),
       |lags AS (SELECT CAST(range + 1 AS BIGINT) AS lag FROM range($MaxLag))
       |SELECT lag, count(*) AS n_pairs,
       |       floor((CAST(sum(a.cy * b.cy) AS DOUBLE) / CAST(dd AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS acf
       |FROM c a JOIN lags ON true JOIN c b ON b.di = a.di + lag, den
       |GROUP BY lag, dd
       |ORDER BY lag""".stripMargin

  /** Equi-depth bucket count. */
  private val EqDepthBuckets = 8

  /** q86: equi-depth histogram — the quantile-boundary statistics an
    * optimizer keeps per column. Orders are ntile'd into 8 equal-count
    * buckets under the TOTAL order (cents, orderkey) — the unique-key
    * tie-break makes the assignment deterministic in both engines — and
    * each bucket reports its count and exact cents boundaries (min/max
    * are order statistics, not sums, so no float accumulation exists at
    * all). Scale: a global sort of (cents, key) pairs — the same cost as
    * any quantile computation; at 100 TB this is the one legitimately
    * total-ordered pass, and it runs on the 2-column projection, not the
    * full row. */
  def equiDepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select($"o_orderkey", floor($"o_totalprice" * 100 + 0.5).cast("long").as("c"))
    val w = Window.orderBy($"c", $"o_orderkey")
    cents.withColumn("bucket", ntile(EqDepthBuckets).over(w))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        halfUp(min($"c").cast("double") / 100.0, 2).as("lo"),
        halfUp(max($"c").cast("double") / 100.0, 2).as("hi"))
      .orderBy("bucket")
  }

  private val equiDepthOracle =
    s"""WITH cents AS (
       |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
       |b AS (SELECT c, ntile($EqDepthBuckets) OVER (ORDER BY c, o_orderkey) AS bucket FROM cents)
       |SELECT bucket, count(*) AS n,
       |       floor((CAST(min(c) AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS lo,
       |       floor((CAST(max(c) AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS hi
       |FROM b GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  /** q87: Wald–Wolfowitz runs test — is daily revenue's above/below-median
    * sequence random, or does it cluster (regime persistence)? The median
    * is the exact lower median of the daily-cents series (order statistic,
    * no averaging); days equal to it are excluded per the classical test.
    * Runs R = 1 + sign changes (integer window count); E[R] and Var[R]
    * come from the exact integers n1, n2 (2·n1·n2 ≈ 3e6 and its products
    * ≈ 8e12 fit long at sf0.1), each converted to double once; z uses
    * IEEE-exact sqrt. Scale: the scan aggregates to the ~2.4k-day series;
    * the median, lag pass, and scalar math all run on that tiny frame. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
    val runs = runsCore(daily)
    runs.select($"n1", $"n2", $"r".as("runs"),
        halfUp(
          ($"r".cast("double")
            - (lit(1.0) + lit(2.0) * ($"n1" * $"n2").cast("double")
                / ($"n1" + $"n2").cast("double")))
            / sqrt((lit(2L) * $"n1" * $"n2"
                * (lit(2L) * $"n1" * $"n2" - ($"n1" + $"n2"))).cast("double")
              / (($"n1" + $"n2") * ($"n1" + $"n2")
                * ($"n1" + $"n2" - 1L)).cast("double")), 4).as("z"))
      .orderBy("n1")
  }

  /** The runs-statistic core over any (di: long, y: long) series: lower
    * median by the (y, di) total order, days equal to it excluded, and
    * one row (n1, n2, r) with r = 1 + sign changes in di order —
    * property-tested against a sequential scan (PropertySpec). */
  private[graft] def runsCore(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val ranked = daily
      .withColumn("rn", row_number().over(Window.orderBy($"y", $"di")))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(lit(1))))
    val med = ranked.filter($"rn" === call_function("div", $"nd" + 1, lit(2)))
      .select($"y".as("m"))
    val signed = daily.crossJoin(broadcast(med))
      .filter($"y" =!= $"m")
      .select($"di", ($"y" > $"m").cast("long").as("sgn"))
    signed
      .withColumn("prev", lag($"sgn", 1).over(Window.orderBy($"di")))
      .agg(sum(when($"prev".isNull || $"prev" =!= $"sgn", 1L).otherwise(0L))
        .as("r"),
        sum($"sgn").as("n1"),
        sum(lit(1L) - $"sgn").as("n2"))
  }

  private val runsTestOracle =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT y, row_number() OVER (ORDER BY y, di) AS rn, count(*) OVER () AS nd
      |  FROM daily),
      |med AS (SELECT y AS m FROM ranked WHERE rn = (nd + 1) // 2),
      |signed AS (
      |  SELECT di, CASE WHEN y > m THEN 1 ELSE 0 END AS sgn
      |  FROM daily, med WHERE y <> m),
      |lagged AS (
      |  SELECT sgn, lag(sgn) OVER (ORDER BY di) AS prev FROM signed),
      |agg AS (
      |  SELECT sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END) AS r,
      |         sum(sgn) AS n1, sum(1 - sgn) AS n2
      |  FROM lagged)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST(r AS BIGINT) AS runs,
      |       floor(((CAST(r AS DOUBLE)
      |               - (1.0 + 2.0 * CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))
      |              / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS DOUBLE)
      |                     / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))
      |             * 10000 + 0.5) / 10000.0 AS z
      |FROM agg
      |ORDER BY n1""".stripMargin

  /** EWMA window depth (terms t-0 .. t-(EwmaTerms-1)). */
  private val EwmaTerms = 8

  /** q88: exponentially weighted moving average — the classic smoothing
    * pass over the daily-revenue series, made bit-deterministic by
    * construction: the decay is α = 1/2, so each term y_{t-k}·2^{-k} is
    * an exact dyadic rational (cents ≤ 2^45 divided by ≤ 2^7 — exactly
    * representable), and the 8-term numerator/denominator are summed in
    * ONE fixed left-to-right association order spelled out identically
    * in both engines. Ragged starts renormalize: the denominator only
    * counts terms that exist. No quantization tricks needed — every
    * intermediate is IEEE-exact. Scale: one keyed aggregate to the day
    * series, then a single ordered window pass over the ~2.4k-row
    * frame with 8 lags sharing one sort. */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
    val w = Window.orderBy($"di")
    val lags = (0 until EwmaTerms).map(k => lag($"y", k).over(w))
    val num = lags.zipWithIndex
      .map { case (l, k) => coalesce(l.cast("double"), lit(0.0)) / (1L << k) }
      .reduceLeft(_ + _)
    val den = lags.zipWithIndex
      .map { case (l, k) => when(l.isNotNull, lit(1.0) / (1L << k)).otherwise(0.0) }
      .reduceLeft(_ + _)
    daily
      .select($"di", $"y", (num / den).as("e"))
      .select($"di", $"y", halfUp($"e" / 100.0, 2).as("ewma"))
      .orderBy("di")
  }

  private val ewmaOracle = {
    val numSql = (0 until EwmaTerms)
      .map(k => s"coalesce(CAST(lag(y, $k) OVER w AS DOUBLE), 0.0) / ${1L << k}")
      .mkString(" + ")
    val denSql = (0 until EwmaTerms)
      .map(k => s"CASE WHEN lag(y, $k) OVER w IS NOT NULL THEN 1.0 / ${1L << k} ELSE 0.0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |e AS (
       |  SELECT di, y, ($numSql) / ($denSql) AS e
       |  FROM daily WINDOW w AS (ORDER BY di))
       |SELECT di, y, floor((e / 100.0) * 100 + 0.5) / 100.0 AS ewma
       |FROM e
       |ORDER BY di""".stripMargin
  }

  /** Hill estimator order-statistic count. */
  private val HillK = 200

  /** q90: Hill tail-index estimator — the heavy-tail diagnostic behind
    * q63's Pareto deciles: over the top-[[HillK]] order values (exact
    * cents, orderkey tie-break), mean log-excess over the (k+1)-th
    * largest as threshold; α = 1/mean is the tail exponent (α ≤ ~2 ⇒
    * infinite-variance tail). Each ln takes a ratio of two exact
    * integers, is quantized half-up to 1e-6 fixed point, and the mean is
    * an order-free integer sum (the x56 recipe, same documented libm
    * boundary margin). Scale: the global sort runs on the 2-column
    * (cents, key) projection and stops at k+1 rows (WindowGroupLimit
    * prunes per partition before the exchange); the log math touches
    * k rows. */
  def hillTail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.orders(spark, dir)
      .select($"o_orderkey", floor($"o_totalprice" * 100 + 0.5).cast("long").as("c"))
      .withColumn("rk", row_number().over(Window.orderBy($"c".desc, $"o_orderkey")))
      .filter($"rk" <= HillK + 1)
    val thr = ranked.filter($"rk" === HillK + 1).select($"c".as("thr"))
    ranked.filter($"rk" <= HillK).crossJoin(broadcast(thr))
      .select($"thr",
        floor(log($"c".cast("double") / $"thr".cast("double")) * 1e6 + 0.5)
          .cast("long").as("l_fp"))
      .groupBy($"thr").agg(count(lit(1)).as("k"), sum($"l_fp").as("s_fp"))
      .select($"k", ($"thr".cast("double") / 100.0).as("thr_price"),
        halfUp($"s_fp".cast("double") / ($"k".cast("double") * 1e6), 6)
          .as("mean_log_excess"),
        halfUp(($"k".cast("double") * 1e6) / $"s_fp".cast("double"), 4)
          .as("alpha"))
      .orderBy("k")
  }

  private val hillTailOracle =
    s"""WITH ranked AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
       |         row_number() OVER (ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rk
       |  FROM orders),
       |thr AS (SELECT c AS thr FROM ranked WHERE rk = ${HillK + 1}),
       |l AS (
       |  SELECT thr,
       |         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(thr AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS l_fp
       |  FROM ranked, thr WHERE rk <= $HillK),
       |a AS (SELECT thr, count(*) AS k, sum(l_fp) AS s_fp FROM l GROUP BY thr)
       |SELECT k, CAST(thr AS DOUBLE) / 100.0 AS thr_price,
       |       floor((CAST(s_fp AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000.0)) * 1000000 + 0.5) / 1000000.0 AS mean_log_excess,
       |       floor(((CAST(k AS DOUBLE) * 1000000.0) / CAST(s_fp AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS alpha
       |FROM a
       |ORDER BY k""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q90_hill_tail",
      "Hill tail-index over top-k order values (fixed-point log-excess sum, Pareto alpha)",
      hillTail, Some(hillTailOracle)),
    QueryDef("q88_ewma",
      "dyadic-decay EWMA over daily revenue: IEEE-exact terms, fixed association order",
      ewma, Some(ewmaOracle)),
    QueryDef("q85_acf",
      "Autocorrelation of daily revenue at lags 1-7 via exact global-mean-free decimal moments",
      acf, Some(acfOracle)),
    QueryDef("q86_equidepth",
      "Equi-depth (quantile) histogram: deterministic ntile buckets with exact cents boundaries",
      equiDepth, Some(equiDepthOracle)),
    QueryDef("q87_runs_test",
      "Wald-Wolfowitz runs test on daily revenue vs lower median (exact counts, IEEE sqrt z)",
      runsTest, Some(runsTestOracle)),
    QueryDef("q79_mann_whitney",
      "Mann-Whitney U rank-sum test per return flag (doubled average ranks, tie-corrected z)",
      mannWhitney, Some(mannWhitneyOracle)),
    QueryDef("q80_ks_test",
      "Kolmogorov-Smirnov two-sample test per return flag (exact integer ECDF-gap maximum)",
      ksTest, Some(ksTestOracle)),
    QueryDef("q75_welch_ttest",
      "Welch two-sample t-test per return flag (exact moments, IEEE-exact t/df)",
      welchTTest, Some(welchTTestOracle)),
    QueryDef("q76_mann_kendall",
      "Mann-Kendall trend test on monthly order counts per nation (exact S and tie-corrected var)",
      mannKendall, Some(mannKendallOracle)),
    QueryDef("q77_spearman",
      "Spearman rank correlation acctbal vs order count per nation (integer doubled average ranks)",
      spearman, Some(spearmanOracle)),
    QueryDef("q78_hampel",
      "Hampel rolling-7 median/MAD outlier filter on monthly revenue (integer threshold predicate)",
      hampel, Some(hampelOracle)),
    QueryDef("q82_theil_sen",
      "Theil-Sen robust trend per priority: median pairwise slope + median-residual intercept",
      theilSen, Some(theilSenOracle)))
}
