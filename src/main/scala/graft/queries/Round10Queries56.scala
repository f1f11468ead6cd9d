package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 fifty-sixth tier: population stability index (q116) — the
  * scorecard-monitoring drift metric that complements x23's JS
  * divergence (PSI is what model-risk teams actually threshold at
  * 0.1/0.25) and x205's Wasserstein (PSI is share-based, W1 is
  * mass-transport-based). */
object Round10Queries56 {

  /** Expected-side decile count. */
  private val PsiBins = 10

  /** q116: PSI of the 1996 order-value distribution against 1995 —
    * bins are DECILES OF THE EXPECTED (1995) distribution (the
    * defining PSI convention: the baseline sets the grid, so a pure
    * shift shows up as tail-bin migration), edges taken as exact
    * rank-based cents cutpoints. Per bin: expected/actual shares in
    * 1e-6 fixed point (+1 Laplace on counts so empty actual bins stay
    * finite), the PSI term (p−q)·ln(p/q) quantized per bin from
    * exact integer ratios (the x56 ln recipe), and the replicated
    * total. PSI < 0.1 ⇒ stable; the fixture's drift lands where it
    * lands, but the CONTRACT is the per-bin decomposition.
    *
    * Scale: decile edges are one rank pass over the 1995 cohort
    * (WindowGroupLimit-prunable); binning the actual side is a
    * broadcast range join against 9 edges; shares and terms are
    * constant-size. */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cents(yr: Int) = Tables.orders(spark, dir)
      .filter(year($"o_orderdate") === yr)
      .select(floor($"o_totalprice" * 100 + 0.5).cast("long").as("c"),
        $"o_orderkey")
    val base = cents(1995).localCheckpoint(true)
    // Driver scalar for the literal edge-rank predicates only (the q112
    // precedent — the data-sized work all stays in the plan).
    val nBase = base.count()
    val edges = base
      .withColumn("rk", row_number().over(Window.orderBy($"c", $"o_orderkey")))
      .filter((1 until PsiBins).map(i =>
        $"rk" === lit((nBase * i / PsiBins).toInt)).reduce(_ || _))
      .select($"c".as("edge"))
      .withColumn("bin", row_number().over(Window.orderBy($"edge")).cast("long"))
      .localCheckpoint(true)
    def binned(df: DataFrame) = df
      .join(broadcast(edges), $"c" > $"edge", "left")
      .groupBy($"o_orderkey").agg(coalesce(max($"bin"), lit(0L)).as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n"))
    val exp = binned(base).toDF("bin", "n_exp")
    val act = binned(cents(1996)).toDF("bin", "n_act")
    val grid = spark.range(PsiBins).select($"id".as("bin"))
      .join(exp, Seq("bin"), "left").join(act, Seq("bin"), "left")
      .na.fill(0L, Seq("n_exp", "n_act"))
    val tots = grid.agg(sum($"n_exp").as("te"), sum($"n_act").as("ta"))
    val terms = grid.crossJoin(broadcast(tots))
      .select($"bin", $"n_exp", $"n_act",
        expr(s"CAST(((n_exp + 1) * 1000000) div (te + $PsiBins) AS BIGINT)")
          .as("p_fp"),
        expr(s"CAST(((n_act + 1) * 1000000) div (ta + $PsiBins) AS BIGINT)")
          .as("q_fp"),
        expr(s"CAST(floor((CAST(n_act + 1 AS DOUBLE)" +
          s" / CAST(ta + $PsiBins AS DOUBLE)" +
          s" - CAST(n_exp + 1 AS DOUBLE) / CAST(te + $PsiBins AS DOUBLE))" +
          s" * ln(CAST((n_act + 1) * (te + $PsiBins) AS DOUBLE)" +
          s" / CAST((n_exp + 1) * (ta + $PsiBins) AS DOUBLE))" +
          s" * 1000000 + 0.5) AS BIGINT)").as("psi_term_fp"))
    val tot = terms.agg(sum($"psi_term_fp").as("psi_fp"))
    terms.crossJoin(broadcast(tot))
      .select($"bin", $"n_exp", $"n_act", $"p_fp", $"q_fp", $"psi_term_fp",
        $"psi_fp")
      .orderBy($"bin")
  }

  private val psiOracle =
    s"""WITH base AS MATERIALIZED (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
       |  FROM orders WHERE year(o_orderdate) = 1995),
       |nb AS (SELECT count(*) AS n FROM base),
       |ranked AS (SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rk
       |           FROM base),
       |edges AS MATERIALIZED (
       |  SELECT c AS edge,
       |         CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS bin
       |  FROM ranked, nb
       |  WHERE ${(1 until PsiBins).map(i => s"rk = (n * $i) // $PsiBins")
            .mkString(" OR ")}),
       |act0 AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
       |  FROM orders WHERE year(o_orderdate) = 1996),
       |bexp AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_exp FROM (
       |    SELECT b.o_orderkey, COALESCE(max(e.bin), 0) AS bin
       |    FROM base b LEFT JOIN edges e ON b.c > e.edge
       |    GROUP BY b.o_orderkey) t GROUP BY bin),
       |bact AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_act FROM (
       |    SELECT a.o_orderkey, COALESCE(max(e.bin), 0) AS bin
       |    FROM act0 a LEFT JOIN edges e ON a.c > e.edge
       |    GROUP BY a.o_orderkey) t GROUP BY bin),
       |grid AS MATERIALIZED (
       |  SELECT g.bin, COALESCE(e.n_exp, 0) AS n_exp, COALESCE(a.n_act, 0) AS n_act
       |  FROM (SELECT CAST(unnest(range(0, $PsiBins)) AS BIGINT) AS bin) g
       |  LEFT JOIN bexp e ON e.bin = g.bin LEFT JOIN bact a ON a.bin = g.bin),
       |tots AS (SELECT CAST(sum(n_exp) AS BIGINT) AS te,
       |                CAST(sum(n_act) AS BIGINT) AS ta FROM grid),
       |terms AS (
       |  SELECT bin, n_exp, n_act,
       |         CAST(((n_exp + 1) * 1000000) // (te + $PsiBins) AS BIGINT) AS p_fp,
       |         CAST(((n_act + 1) * 1000000) // (ta + $PsiBins) AS BIGINT) AS q_fp,
       |         CAST(floor((CAST(n_act + 1 AS DOUBLE)
       |           / CAST(ta + $PsiBins AS DOUBLE)
       |           - CAST(n_exp + 1 AS DOUBLE) / CAST(te + $PsiBins AS DOUBLE))
       |           * ln(CAST((n_act + 1) * (te + $PsiBins) AS DOUBLE)
       |           / CAST((n_exp + 1) * (ta + $PsiBins) AS DOUBLE))
       |           * 1000000 + 0.5) AS BIGINT) AS psi_term_fp
       |  FROM grid, tots),
       |tot AS (SELECT CAST(sum(psi_term_fp) AS BIGINT) AS psi_fp FROM terms)
       |SELECT bin, n_exp, n_act, p_fp, q_fp, psi_term_fp, psi_fp
       |FROM terms, tot ORDER BY bin""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q116_psi",
      "population stability index 1995->1996 on expected-side deciles: Laplace-smoothed shares, per-bin quantized (p-q)ln(p/q), replicated total",
      psi, Some(psiOracle)))
}
