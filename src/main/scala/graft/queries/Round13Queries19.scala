package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 nineteenth tier: the rank-based SCALE test (Ansari–Bradley —
  * the nonparametric sibling of x333's Brown–Forsythe: do two groups
  * differ in dispersion?) and the sort-order advisor (which clustering
  * key minimizes the table's total RLE footprint — the layout DECISION
  * on top of x338's per-column encoding census; q81's z-order kin).
  */
object Round13Queries19 {

  /** Two-sided normal critical value at α = 0.05. */
  private val ZCrit = 1.959963985

  // ---------------------------------------------------------------- x351

  /** x351: Ansari–Bradley test on quantity dispersion, flag 'A' vs 'R'.
    * AB scores rank from BOTH ends (score(r) = min(r, N+1−r)); tie
    * blocks take the block-average score. Everything stays exact off the
    * value census: a tie block occupying ranks [lo, hi] has a CLOSED-FORM
    * integer score sum (ascending arm Σr up to ⌊(N+1)/2⌋, descending arm
    * Σ(N+1−r) after it — consecutive-integer sums, so the DIV 2 is
    * lossless), and the per-group score mass W = Σ cₐ·blockSum/t
    * (MILLI-quantized) plus the squared mass Σ blockSum²/t
    * (KILO-quantized) with truncating division and DECIMAL(38)/HUGEINT
    * products — bs²·10⁶ blows 2⁶³ already at sf0.01, so the scales are
    * sized for the SUMS to stay BIGINT at GenScale sf1 (the x330 rule).
    * z = (W − nₐ·S/N) / √(nₐ·n_r·(N·Σs² − S²)/(N²(N−1))) as identical
    * doubles, two-sided flag at 1.96.
    *
    * Scale: the only corpus pass is the map-side-combinable value
    * census (≤ 50 rows); the score algebra never leaves it. */
  def ansariBradley(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .filter($"l_returnflag".isin("A", "R"))
      .select($"l_quantity".cast("long").as("v"), $"l_returnflag".as("g"))
      .groupBy($"v")
      .agg(sum(when($"g" === "A", 1L).otherwise(0L)).as("ca"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("cr"))
      .withColumn("t", $"ca" + $"cr")
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    val tot = census.agg(sum($"t").as("nn"), sum($"ca").as("na"), sum($"cr").as("nr"))
    val blocks = census
      .withColumn("lo", coalesce(sum($"t").over(w), lit(0L)) + 1L)
      .withColumn("hi", coalesce(sum($"t").over(w), lit(0L)) + $"t")
      .crossJoin(broadcast(tot))
      // ascending arm [lo, min(hi, c)] with c = (nn+1) DIV 2, then the
      // descending arm [max(lo, c+1), hi] scoring nn+1-r
      .withColumn("c", expr("(nn + 1) DIV 2"))
      .withColumn("b1", least($"hi", $"c"))
      .withColumn("a2", greatest($"lo", $"c" + 1L))
      .withColumn("s1", when($"b1" >= $"lo",
        expr("(b1 * (b1 + 1) - (lo - 1) * lo) DIV 2")).otherwise(0L))
      .withColumn("s2", when($"hi" >= $"a2",
        ($"hi" - $"a2" + 1L) * ($"nn" + 1L) -
          expr("(hi * (hi + 1) - (a2 - 1) * a2) DIV 2")).otherwise(0L))
      .withColumn("bs", $"s1" + $"s2")
    // bs ~ t·N/4, so bs²·10⁶ blows 2⁶³ already at sf0.01 — products run
    // in DECIMAL(38) and the quantization scales are sized so the SUMS
    // stay in BIGINT at GenScale sf1: W in milli-units, Σs² in kilo-units
    val agg = blocks.groupBy($"nn", $"na", $"nr").agg(
      sum($"bs").as("stot"),
      sum(expr("CAST((CAST(ca AS DECIMAL(38,0)) * bs * 1000) DIV t AS BIGINT)")).as("wq"),
      sum(expr("CAST((CAST(bs AS DECIMAL(38,0)) * bs) DIV (CAST(t AS DECIMAL(38,0)) * 1000) AS BIGINT)")).as("s2q"))
    def d(c: Column) = c.cast("double")
    val wA = d($"wq") / 1e3
    val e0 = d($"na") * d($"stot") / d($"nn")
    val varW = d($"na") * d($"nr") *
      (d($"nn") * (d($"s2q") * 1e3) - d($"stot") * d($"stot")) /
      (d($"nn") * d($"nn") * (d($"nn") - 1.0))
    val z = (wA - e0) / sqrt(varW)
    agg.select($"nn", $"na", $"nr", $"stot", $"wq", $"s2q",
      QueryUtil.halfUp4(z).as("z"),
      when(abs(z) > ZCrit, 1L).otherwise(0L).as("sig"))
  }

  private val ansariBradleyOracle =
    s"""WITH census AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS v,
       |         CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
       |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
       |cum AS (
       |  SELECT *, ca + cr AS t,
       |         COALESCE(sum(ca + cr) OVER (ORDER BY v
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |  FROM census),
       |tot AS (SELECT CAST(sum(ca + cr) AS BIGINT) AS nn, CAST(sum(ca) AS BIGINT) AS na,
       |               CAST(sum(cr) AS BIGINT) AS nr FROM census),
       |blocks AS (
       |  SELECT ca, cr, t, prev + 1 AS lo, prev + t AS hi, nn, na, nr,
       |         (nn + 1) // 2 AS c
       |  FROM cum CROSS JOIN tot),
       |scored AS (
       |  SELECT *,
       |         CASE WHEN least(hi, c) >= lo
       |              THEN (least(hi, c) * (least(hi, c) + 1) - (lo - 1) * lo) // 2
       |              ELSE 0 END
       |       + CASE WHEN hi >= greatest(lo, c + 1)
       |              THEN (hi - greatest(lo, c + 1) + 1) * (nn + 1)
       |                   - (hi * (hi + 1) - (greatest(lo, c + 1) - 1) * greatest(lo, c + 1)) // 2
       |              ELSE 0 END AS bs
       |  FROM blocks),
       |agg AS (
       |  SELECT nn, na, nr,
       |         CAST(sum(bs) AS BIGINT) AS stot,
       |         CAST(sum((CAST(ca AS HUGEINT) * bs * 1000) // t) AS BIGINT) AS wq,
       |         CAST(sum((CAST(bs AS HUGEINT) * bs) // (CAST(t AS HUGEINT) * 1000)) AS BIGINT) AS s2q
       |  FROM scored GROUP BY 1, 2, 3),
       |stat AS (
       |  SELECT *,
       |         (CAST(wq AS DOUBLE) / 1e3
       |          - CAST(na AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE))
       |         / sqrt(CAST(na AS DOUBLE) * CAST(nr AS DOUBLE)
       |                * (CAST(nn AS DOUBLE) * (CAST(s2q AS DOUBLE) * 1e3)
       |                   - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE))
       |                / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
       |                   * (CAST(nn AS DOUBLE) - 1.0))) AS z_raw
       |  FROM agg)
       |SELECT nn, na, nr, stot, wq, s2q,
       |       floor(z_raw * 10000 + 0.5) / 10000.0 AS z,
       |       CAST(CASE WHEN abs(z_raw) > $ZCrit THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM stat""".stripMargin

  // ---------------------------------------------------------------- x352

  /** Candidate clustering keys the advisor sweeps. */
  private val SortCandidates = Seq("flag", "status", "year")

  /** x352: sort-order advisor — which clustering key minimizes the
    * table's total RLE footprint across the profiled columns? For each
    * candidate key the table is (logically) sorted by (key, orderkey,
    * linenumber, value); runs are counted per candidate-key VALUE
    * partition — which is both what a sorted writer's pages see and what
    * lets every window run parallel (no global sort materializes). RLE
    * bytes = runs·(maxlen + 4) per column (the x338 model); the winner
    * is the candidate with the smallest total, ties to the
    * lexicographically first candidate. All integers.
    *
    * Scale: one melt pass per candidate over 3 profiled columns —
    * bounded fan-out (|candidates| × |columns|); windows partition by
    * the candidate's value domain. */
  def sortOrderAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        expr("l_orderkey DIV 1000").as("page"),
        $"l_returnflag".as("v_flag"), $"l_linestatus".as("v_status"),
        year($"l_shipdate").cast("long").cast("string").as("v_year"),
        $"l_quantity".cast("long").cast("string").as("v_qty"))
    // one window pass PER CANDIDATE computing all three columns' run
    // flags at once — a (candidate x column) melt shuffled 9x the table
    // (24 s at sf1, volume-bound); this ships 3x with page-local
    // partitions (the x338 model). The tie order closes over ALL value
    // columns so every column's run census is engine-deterministic.
    val perCand = SortCandidates.map { cand =>
      val w = Window.partitionBy(col(s"v_$cand"), $"page")
        .orderBy($"l_orderkey", $"l_linenumber", $"v_flag", $"v_qty", $"v_year")
      def chg(c: String) = when(lag(col(c), 1).over(w).isNull ||
        lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L)
      base
        .withColumn("cf", chg("v_flag"))
        .withColumn("cq", chg("v_qty"))
        .withColumn("cy", chg("v_year"))
        .agg(sum($"cf").as("runs_flag"), sum($"cq").as("runs_qty"),
          sum($"cy").as("runs_year"),
          max(length($"v_flag").cast("long")).as("w_flag"),
          max(length($"v_qty").cast("long")).as("w_qty"),
          max(length($"v_year").cast("long")).as("w_year"))
        .select(lit(cand).as("cand"), $"runs_flag", $"runs_qty", $"runs_year",
          $"w_flag", $"w_qty", $"w_year")
    }.reduce(_ unionByName _)
    val runs = perCand.selectExpr("cand",
      "stack(3, 'flag', runs_flag, w_flag, 'qty', runs_qty, w_qty, " +
        "'year', runs_year, w_year) AS (col_name, runs, wmax)")
      .withColumn("rle_b", $"runs" * ($"wmax" + 4L))
    val totals = runs.groupBy($"cand").agg(sum($"rle_b").as("total_b"))
    val best = totals
      .withColumn("rn", row_number().over(Window.orderBy($"total_b", $"cand")))
      .select($"cand", ($"rn" === 1).cast("long").as("best"))
    runs.join(totals, "cand").join(best, "cand")
      .select($"cand", $"col_name", $"runs", $"rle_b", $"total_b", $"best")
      .orderBy($"cand", $"col_name")
  }

  private val sortOrderAdvisorOracle = {
    val cands = SortCandidates.map { cand =>
      val w = s"OVER (PARTITION BY v_$cand, page ORDER BY l_orderkey, l_linenumber, v_flag, v_qty, v_year)"
      s"""SELECT '$cand' AS cand,
         |       CAST(sum(cf) AS BIGINT) AS runs_flag,
         |       CAST(sum(cq) AS BIGINT) AS runs_qty,
         |       CAST(sum(cy) AS BIGINT) AS runs_year,
         |       CAST(max(length(v_flag)) AS BIGINT) AS w_flag,
         |       CAST(max(length(v_qty)) AS BIGINT) AS w_qty,
         |       CAST(max(length(v_year)) AS BIGINT) AS w_year
         |FROM (SELECT v_flag, v_qty, v_year,
         |        CASE WHEN lag(v_flag) $w IS DISTINCT FROM v_flag THEN 1 ELSE 0 END AS cf,
         |        CASE WHEN lag(v_qty) $w IS DISTINCT FROM v_qty THEN 1 ELSE 0 END AS cq,
         |        CASE WHEN lag(v_year) $w IS DISTINCT FROM v_year THEN 1 ELSE 0 END AS cy
         |      FROM base)""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT l_orderkey, l_linenumber, l_orderkey // 1000 AS page,
       |         l_returnflag AS v_flag, l_linestatus AS v_status,
       |         CAST(CAST(year(l_shipdate) AS BIGINT) AS VARCHAR) AS v_year,
       |         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v_qty
       |  FROM lineitem),
       |per_cand AS MATERIALIZED (
       |  $cands),
       |runs AS (
       |  SELECT cand, col_name, runs, wmax FROM (
       |    SELECT cand, 'flag' AS col_name, runs_flag AS runs, w_flag AS wmax FROM per_cand
       |    UNION ALL
       |    SELECT cand, 'qty', runs_qty, w_qty FROM per_cand
       |    UNION ALL
       |    SELECT cand, 'year', runs_year, w_year FROM per_cand)),
       |sized AS (SELECT *, runs * (wmax + 4) AS rle_b FROM runs),
       |totals AS (SELECT cand, CAST(sum(rle_b) AS BIGINT) AS total_b
       |           FROM sized GROUP BY 1),
       |best AS (
       |  SELECT cand, CAST(CASE WHEN row_number() OVER (ORDER BY total_b, cand) = 1
       |                         THEN 1 ELSE 0 END AS BIGINT) AS best
       |  FROM totals)
       |SELECT s.cand, s.col_name, s.runs, s.rle_b, t.total_b, b.best
       |FROM sized s JOIN totals t USING (cand) JOIN best b ON b.cand = s.cand
       |ORDER BY s.cand, s.col_name""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x351_ansari_bradley",
      "Ansari-Bradley rank scale test: both-end scores with closed-form integer tie-block sums off the value census",
      ansariBradley, Some(ansariBradleyOracle)),
    QueryDef("x352_sort_order_advisor",
      "sort-order advisor: total RLE footprint per candidate clustering key, runs counted inside key-value partitions",
      sortOrderAdvisor, Some(sortOrderAdvisorOracle)))
}
