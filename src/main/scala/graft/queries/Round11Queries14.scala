package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 fourteenth tier: EXACT Shapley-value channel attribution
  * (the game-theoretic counterpart to q49's heuristic rules and x203's
  * Markov removal effects — with 4 channels the 2⁴ coalition lattice is
  * enumerated outright and every Shapley value is an exact integer
  * multiple of 1/24), plus two engine-surface parity pins: Spark's
  * relational PIVOT against explicit conditional aggregation, and the
  * tie semantics of the rank-function family (rank / dense_rank /
  * percent_rank / cume_dist / ntile) cross-engine.
  */
object Round11Queries14 {

  /** Channel bit assignment for the coalition masks. */
  private val Channels = Seq(("view", 1L), ("click", 2L), ("signup", 4L), ("error", 8L))

  /** Shapley weights ×24: s!(4−s−1)! for coalition size s of 4 players. */
  private val ShapW = Seq(6L, 2L, 2L, 6L)

  // ---------------------------------------------------------------- x276

  /** x276: exact Shapley-value attribution — players are the four
    * pre-purchase touch channels; the coalition value v(S) counts
    * converted users whose pre-first-purchase touchset ⊆ S (monotone,
    * integer). With 4 players the subset lattice (16 coalitions) is
    * enumerated as a literal frame, v is one subset-sum over the
    * 16-mask census, and each channel's Shapley value is
    * `φ_c = Σ_{S∌c} s!(3−s)!·(v(S∪c)−v(S)) / 4!` — emitted as the exact
    * BIGINT `φ·24` plus the efficiency audit Σφ = v(full) − v(∅) that
    * pins the whole computation. No sampling, no permutation Monte
    * Carlo — at 4–20 channels exact enumeration is the honest method.
    *
    * Scale: the corpus stage is one pass to first-purchase timestamps +
    * one bitmask aggregate per user; everything after runs on ≤16-row
    * frames. At a billion users the masks census is still 16 rows. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id".as("u"), $"ts", $"event_type")
    val firstPurchase = ev.filter($"event_type" === "purchase")
      .groupBy($"u").agg(min($"ts").as("pts"))
    val chanBit = Channels.foldLeft(lit(0L)) { case (acc, (name, bit)) =>
      when($"event_type" === name, lit(bit)).otherwise(acc)
    }
    // bit_or aggregate spelled as sum of distinct bits (each bit once)
    val userMask = ev.join(firstPurchase, "u")
      .filter($"ts" < $"pts" && $"event_type" =!= "purchase")
      .select($"u", chanBit.as("b"))
      .distinct()
      .groupBy($"u").agg(sum($"b").as("m"))
    val allConverted = firstPurchase.select($"u")
    val census = allConverted
      .join(userMask, Seq("u"), "left")
      .select(coalesce($"m", lit(0L)).as("m"))
      .groupBy($"m").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val subsets = spark.range(16).select($"id".cast("long").as("s"))
    val v = subsets.join(broadcast(census),
        ($"m".bitwiseAND($"s")) === $"m", "left")
      .groupBy($"s").agg(coalesce(sum($"cnt"), lit(0L)).as("v"))
      .localCheckpoint(true)
    val chans = Channels.toDF("channel", "bit")
    val wCase = ShapW.zipWithIndex.foldLeft(lit(0L)) { case (acc, (w, s)) =>
      when(expr("bit_count(s)") === s, lit(w)).otherwise(acc)
    }
    val terms = chans.crossJoin(v.select($"s", $"v".as("vs")))
      .filter(($"s".bitwiseAND($"bit")) === 0L)
      .join(broadcast(v.select($"s".as("sb"), $"v".as("vsb"))),
        ($"s".bitwiseOR($"bit")) === $"sb")
      .select($"channel", $"bit", (wCase * ($"vsb" - $"vs")).as("term"))
    val audit = v.filter($"s" === 15L).select($"v".as("v_full"))
      .crossJoin(v.filter($"s" === 0L).select($"v".as("v_empty")))
    terms.groupBy($"channel", $"bit").agg(sum($"term").as("phi24"))
      .crossJoin(broadcast(audit))
      .select($"channel", $"phi24",
        ($"phi24".cast("double") / 24.0).as("phi"),
        $"v_full", $"v_empty")
      .orderBy($"channel")
  }

  private val shapleyAttributionOracle = {
    val chanVals = Channels.map { case (n, b) => s"('$n', $b)" }.mkString(", ")
    val wCase = ShapW.zipWithIndex
      .map { case (w, s) => s"WHEN bit_count(va.s) = $s THEN $w" }
      .mkString(" ")
    s"""WITH fp AS MATERIALIZED (
       |  SELECT user_id AS u, min(ts) AS pts FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |bits AS (
       |  SELECT DISTINCT e.user_id AS u,
       |         CASE e.event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
       |              WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END AS b
       |  FROM events e JOIN fp ON fp.u = e.user_id
       |  WHERE e.ts < fp.pts AND e.event_type <> 'purchase'),
       |um AS (SELECT u, CAST(sum(b) AS BIGINT) AS m FROM bits GROUP BY u),
       |census AS MATERIALIZED (
       |  SELECT COALESCE(um.m, 0) AS m, CAST(count(*) AS BIGINT) AS cnt
       |  FROM fp LEFT JOIN um ON um.u = fp.u
       |  GROUP BY 1),
       |subsets AS (SELECT CAST(unnest(range(16)) AS BIGINT) AS s),
       |v AS MATERIALIZED (
       |  SELECT s, CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS v
       |  FROM subsets LEFT JOIN census ON (m & s) = m
       |  GROUP BY s),
       |chans AS (SELECT * FROM (VALUES $chanVals) t(channel, bit)),
       |terms AS (
       |  SELECT c.channel, c.bit,
       |         (CASE $wCase END) * (vb.v - va.v) AS term
       |  FROM chans c
       |  JOIN v va ON (va.s & c.bit) = 0
       |  JOIN v vb ON vb.s = (va.s | c.bit)),
       |audit AS (
       |  SELECT (SELECT v FROM v WHERE s = 15) AS v_full,
       |         (SELECT v FROM v WHERE s = 0) AS v_empty)
       |SELECT channel, CAST(sum(term) AS BIGINT) AS phi24,
       |       CAST(sum(term) AS DOUBLE) / 24.0 AS phi,
       |       max(v_full) AS v_full, max(v_empty) AS v_empty
       |FROM terms, audit
       |GROUP BY channel
       |ORDER BY channel""".stripMargin
  }

  // ---------------------------------------------------------------- x277

  /** x277: relational PIVOT parity — yearly revenue (exact integer
    * cents) per customer nation through Spark's `groupBy().pivot()`
    * operator with a FIXED value list (the scale-safe spelling: an
    * unlisted pivot would scan once just to discover columns), against
    * the oracle's explicit conditional aggregation — pinning that the
    * pivot operator is exactly conditional aggregation, with absent
    * cells as zero via per-column coalesce.
    *
    * Scale: one hash aggregate wide — the pivot adds no shuffle beyond
    * the group-by when the column list is literal. */
  def pivotParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val years = (1995 to 2001).map(_.toString)
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name",
        year($"o_orderdate").cast("string").as("yr"),
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"))
    val pivoted = base.groupBy($"n_name").pivot("yr", years).sum("cents")
    years.foldLeft(pivoted) { (df, y) =>
      df.withColumn(s"rev_$y", coalesce(col(y), lit(0L))).drop(y)
    }.orderBy($"n_name")
  }

  private val pivotParityOracle = {
    val cols = (1995 to 2001).map { y =>
      s"""CAST(COALESCE(sum(CASE WHEN year(o_orderdate) = $y
         |           THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
         |           END), 0) AS BIGINT) AS rev_$y""".stripMargin
    }.mkString(",\n")
    s"""SELECT n_name,
       |$cols
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------- x278

  /** x278: rank-function tie-semantics parity — Spark's BUILTIN rank /
    * dense_rank / percent_rank / cume_dist run over the row-level
    * per-nation balance ordering (exact cents, real tie groups), then
    * collapsed to one row per distinct (nation, balance); the oracle
    * re-derives every function from the value census by pure integer
    * arithmetic (rank = rows strictly before + 1, percent_rank =
    * before/(n−1), cume_dist = peers-inclusive cum/n). Agreement pins
    * that the builtins implement exactly the SQL-standard tie
    * semantics. ntile is deliberately absent: its bucket boundary
    * WITHIN a tie group is row-order-dependent, i.e. not deterministic
    * — that exclusion is itself the documented finding.
    *
    * Scale: this one runs the real builtins row-level by design (the
    * semantics under test); the census recipe (x270) is the scale path
    * when only the per-value result is needed. */
  def rankFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.customer(spark, dir)
      .select($"c_nationkey".cast("long").as("nk"),
        floor($"c_acctbal" * 100.0 + 0.5).cast("long").as("bal"))
    val w = Window.partitionBy($"nk").orderBy($"bal")
    val r = rows
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
    r.groupBy($"nk", $"bal")
      .agg(count(lit(1)).as("t"),
        max($"rnk").as("rnk"), max($"drnk").as("drnk"),
        QueryUtil.halfUp(max($"pr"), 6).as("pct_rank"),
        QueryUtil.halfUp(max($"cd"), 6).as("cume_dist"))
      .filter($"drnk" <= 20L) // the first 20 distinct values per nation
      .orderBy($"nk", $"bal")
  }

  private val rankFunctionsOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
      |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
      |         CAST(count(*) AS BIGINT) AS t
      |  FROM customer GROUP BY 1, 2),
      |ranked AS (
      |  SELECT nk, bal, t,
      |         CAST(sum(t) OVER (PARTITION BY nk) AS BIGINT) AS n,
      |         CAST(sum(t) OVER (PARTITION BY nk ORDER BY bal
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |         CAST(COALESCE(sum(t) OVER (PARTITION BY nk ORDER BY bal
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS bef,
      |         CAST(row_number() OVER (PARTITION BY nk ORDER BY bal)
      |           AS BIGINT) AS drnk
      |  FROM census)
      |SELECT nk, bal, t, bef + 1 AS rnk, drnk,
      |       floor(CAST(bef AS DOUBLE) / CAST(n - 1 AS DOUBLE)
      |             * 1000000 + 0.5) / 1000000.0 AS pct_rank,
      |       floor(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
      |             * 1000000 + 0.5) / 1000000.0 AS cume_dist
      |FROM ranked
      |WHERE drnk <= 20
      |ORDER BY nk, bal""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x276_shapley_attribution",
      "EXACT Shapley channel attribution over the 16-coalition lattice with efficiency audit",
      shapleyAttribution, Some(shapleyAttributionOracle)),
    QueryDef("x277_pivot_parity",
      "groupBy().pivot() with literal columns vs explicit conditional aggregation",
      pivotParity, Some(pivotParityOracle)),
    QueryDef("x278_rank_functions",
      "rank/dense-rank/percent-rank/cume-dist tie semantics on the value census",
      rankFunctions, Some(rankFunctionsOracle)))
}
