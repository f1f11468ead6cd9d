package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 first tier: the remaining classical exact-rank inference
  * battery over value censuses — Kruskal–Wallis (k-group rank ANOVA),
  * Wilcoxon signed-rank (paired), McNemar (paired binary), and
  * Jonckheere–Terpstra (ordered-alternative trend across k groups).
  * All four follow the x270 Mann–Whitney contract: every rank/count
  * statistic is BIGINT-exact off the value census (doubled ranks for
  * half-integer ties), and the normal/χ² approximations are computed
  * from those integers with IEEE-deterministic double expressions
  * written identically in both engines (sqrt/÷/× are correctly rounded;
  * only libm transcendentals diverge), then halfUp-quantized.
  */
object Round13Queries1 {

  // ---------------------------------------------------------------- x310

  /** x310: Kruskal–Wallis H across the three return flags on quantity —
    * does at least one flag's quantity distribution sit shifted? Ranks
    * come from the 50-value census (doubled average ranks, BIGINT);
    * the three per-group doubled rank sums pivot into ONE row (the
    * fixture's flag domain is exactly {A,N,R} — the x277 known-domain
    * pivot contract), so the cross-group Σ R_g²/n_g happens as scalar
    * double arithmetic in a single projection, never a
    * partial-aggregation-order-dependent double sum. Tie-corrected:
    * H / (1 − Σ(t³−t)/(N³−N)). Significance is the unquantized-double
    * compare against χ²₀.₀₅,₂ = 5.991464547 — identical doubles on both
    * engines make the flag deterministic.
    *
    * Scale: the census is ≤50 rows regardless of corpus size; the only
    * full-data pass is the map-side-combinable groupBy(v). Doubled rank
    * sums stay < 2N² (exact in BIGINT and in double up to N ≈ 6·10⁷). */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("v"), $"l_returnflag".as("g"))
      .groupBy($"v")
      .agg(count(lit(1)).as("t"),
        sum(when($"g" === "A", 1L).otherwise(0L)).as("ca"),
        sum(when($"g" === "N", 1L).otherwise(0L)).as("cn"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("cr"))
    val w = Window.orderBy($"v").rowsBetween(Long.MinValue, -1)
    val ranked = census
      .withColumn("r2", lit(2L) * coalesce(sum($"t").over(w), lit(0L)) + $"t" + 1L)
    val agg = ranked.agg(
      sum($"t").as("n"),
      sum($"ca").as("na"), sum($"cn").as("nn"), sum($"cr").as("nr"),
      sum($"ca" * $"r2").as("r2a"), sum($"cn" * $"r2").as("r2n"),
      sum($"cr" * $"r2").as("r2r"),
      sum($"t" * $"t" * $"t" - $"t").as("tie3"))
    def d(c: Column) = c.cast("double")
    val hUnc = (lit(3.0) * (d($"r2a") * d($"r2a") / d($"na")
      + d($"r2n") * d($"r2n") / d($"nn")
      + d($"r2r") * d($"r2r") / d($"nr"))
      / (d($"n") * d($"n" + 1L))
      - lit(3.0) * d($"n" + 1L))
    val corr = lit(1.0) - d($"tie3") / (d($"n") * d($"n") * d($"n") - d($"n"))
    agg.select($"n", $"na", $"nn", $"nr", $"r2a", $"r2n", $"r2r", $"tie3",
      QueryUtil.halfUp4(hUnc / corr).as("h"),
      when(hUnc / corr > 5.991464547, 1L).otherwise(0L).as("sig"))
  }

  private val kruskalWallisOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t,
      |         CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
      |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
      |  FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT *, 2 * COALESCE(sum(t) OVER (ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM census),
      |agg AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n,
      |         CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cn) AS BIGINT) AS nn,
      |         CAST(sum(cr) AS BIGINT) AS nr,
      |         CAST(sum(ca * r2) AS BIGINT) AS r2a,
      |         CAST(sum(cn * r2) AS BIGINT) AS r2n,
      |         CAST(sum(cr * r2) AS BIGINT) AS r2r,
      |         CAST(sum(t * t * t - t) AS BIGINT) AS tie3
      |  FROM ranked),
      |h AS (
      |  SELECT *,
      |         (3.0 * (CAST(r2a AS DOUBLE) * CAST(r2a AS DOUBLE) / CAST(na AS DOUBLE)
      |                 + CAST(r2n AS DOUBLE) * CAST(r2n AS DOUBLE) / CAST(nn AS DOUBLE)
      |                 + CAST(r2r AS DOUBLE) * CAST(r2r AS DOUBLE) / CAST(nr AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
      |          - 3.0 * CAST(n + 1 AS DOUBLE))
      |         / (1.0 - CAST(tie3 AS DOUBLE)
      |                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |                     - CAST(n AS DOUBLE))) AS h_raw
      |  FROM agg)
      |SELECT n, na, nn, nr, r2a, r2n, r2r, tie3,
      |       floor(h_raw * 10000 + 0.5) / 10000.0 AS h,
      |       CAST(CASE WHEN h_raw > 5.991464547 THEN 1 ELSE 0 END AS BIGINT) AS sig
      |FROM h""".stripMargin

  // ---------------------------------------------------------------- x311

  /** Pairing cut for the signed-rank halves (ship years 1995–97 vs
    * 1998–2001). */
  private val WsrCut = "1998-01-01 00:00:00"

  /** x311: Wilcoxon signed-rank — did per-part shipped quantity shift
    * between the two halves of the shipdate range? One paired
    * difference per part (BIGINT quantity sums), zeros dropped per the
    * textbook procedure, |d| ranked through the census with doubled
    * average ranks, W⁺ kept doubled (w2p). The z-score uses the
    * tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48 with the
    * continuity-free form, computed as identical doubles.
    *
    * Scale: one groupBy(partkey) pass over the fact table, then a
    * census over |d| (bounded by the part count, itself census-shaped);
    * no pairwise anything. */
  def wilcoxonSignedRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val diffs = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        when($"l_shipdate" < lit(WsrCut).cast("timestamp"),
          $"l_quantity".cast("long")).otherwise(0L).as("q1"),
        when($"l_shipdate" >= lit(WsrCut).cast("timestamp"),
          $"l_quantity".cast("long")).otherwise(0L).as("q2"))
      .groupBy($"l_partkey")
      .agg((sum($"q1") - sum($"q2")).as("d"))
      .filter($"d" =!= 0L)
    val census = diffs
      .select(abs($"d").as("a"), when($"d" > 0L, 1L).otherwise(0L).as("pos"))
      .groupBy($"a").agg(count(lit(1)).as("t"), sum($"pos").as("tp"))
    val w = Window.orderBy($"a").rowsBetween(Long.MinValue, -1)
    val ranked = census
      .withColumn("r2", lit(2L) * coalesce(sum($"t").over(w), lit(0L)) + $"t" + 1L)
    val agg = ranked.agg(
      sum($"t").as("n"), sum($"tp" * $"r2").as("w2p"),
      sum($"t" * $"t" * $"t" - $"t").as("tie3"))
    def d(c: Column) = c.cast("double")
    agg.select($"n", $"w2p", $"tie3",
      QueryUtil.halfUp4(
        (d($"w2p") / 2.0 - d($"n") * d($"n" + 1L) / 4.0)
          / sqrt(d($"n") * d($"n" + 1L) * d(lit(2L) * $"n" + 1L) / 24.0
            - d($"tie3") / 48.0)).as("z"))
  }

  private val wilcoxonOracle =
    s"""WITH diffs AS MATERIALIZED (
       |  SELECT l_partkey,
       |         CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '$WsrCut'
       |                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
       |              - sum(CASE WHEN l_shipdate >= TIMESTAMP '$WsrCut'
       |                         THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
       |              AS BIGINT) AS d
       |  FROM lineitem GROUP BY 1),
       |census AS (
       |  SELECT abs(d) AS a, CAST(count(*) AS BIGINT) AS t,
       |         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM diffs WHERE d <> 0 GROUP BY 1),
       |ranked AS (
       |  SELECT *, 2 * COALESCE(sum(t) OVER (ORDER BY a
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
       |  FROM census),
       |agg AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n,
       |         CAST(sum(tp * r2) AS BIGINT) AS w2p,
       |         CAST(sum(t * t * t - t) AS BIGINT) AS tie3
       |  FROM ranked)
       |SELECT n, w2p, tie3,
       |       floor((CAST(w2p AS DOUBLE) / 2.0
       |              - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 4.0)
       |             / sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
       |                    * CAST(2 * n + 1 AS DOUBLE) / 24.0
       |                    - CAST(tie3 AS DOUBLE) / 48.0)
       |             * 10000 + 0.5) / 10000.0 AS z
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- x312

  /** Timeline split for the paired binary outcome. */
  private val McnCut = "2024-01-16 00:00:00"

  /** Outcome rarity threshold (purchase value). */
  private val McnValue = 100.0

  /** x312: McNemar's test on paired binary outcomes — did users'
    * HIGH-VALUE purchase behavior (value > [[McnValue]]) change between
    * the first and second half of the event window? (Plain "any
    * purchase" is degenerate on this fixture — every user buys in both
    * halves — so the outcome is the rarer event that actually has
    * discordant cells at every SF.) Each user contributes one
    * (before, after) bit pair;
    * only the discordant cells b (yes→no) and c (no→yes) carry signal:
    * χ² = (b−c)²/(b+c), an exact rational. Significance is decided by
    * the EXACT cross-multiplied integer predicate
    * (b−c)²·10⁴ > 38415·(b+c) (χ²₀.₀₅,₁ = 3.8415), so the flag never
    * rides a double.
    *
    * Scale: one groupBy(user) over events with map-side max() partials,
    * then a 4-cell count — nothing grows with the corpus but the first
    * shuffle's key count. */
  def mcnemar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.events(spark, dir)
      .select($"user_id",
        when($"event_type" === "purchase" && $"value" > McnValue &&
          $"ts" < lit(McnCut).cast("timestamp_ntz"), 1L).otherwise(0L).as("p1"),
        when($"event_type" === "purchase" && $"value" > McnValue &&
          $"ts" >= lit(McnCut).cast("timestamp_ntz"), 1L).otherwise(0L).as("p2"))
      .groupBy($"user_id")
      .agg(max($"p1").as("h1"), max($"p2").as("h2"))
    val cells = pairs.agg(
      sum(when($"h1" === 1L && $"h2" === 1L, 1L).otherwise(0L)).as("yy"),
      sum(when($"h1" === 1L && $"h2" === 0L, 1L).otherwise(0L)).as("b"),
      sum(when($"h1" === 0L && $"h2" === 1L, 1L).otherwise(0L)).as("c"),
      sum(when($"h1" === 0L && $"h2" === 0L, 1L).otherwise(0L)).as("nn"))
    cells.select($"yy", $"b", $"c", $"nn",
      when($"b" + $"c" > 0L,
        QueryUtil.halfUp(($"b" - $"c").cast("double") * ($"b" - $"c").cast("double")
          / ($"b" + $"c").cast("double"), 6)).as("chi2"),
      when(($"b" - $"c") * ($"b" - $"c") * 10000L > lit(38415L) * ($"b" + $"c"), 1L)
        .otherwise(0L).as("sig"))
  }

  private val mcnemarOracle =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT user_id,
       |         max(CASE WHEN event_type = 'purchase' AND value > $McnValue
       |                   AND ts < TIMESTAMP '$McnCut' THEN 1 ELSE 0 END) AS h1,
       |         max(CASE WHEN event_type = 'purchase' AND value > $McnValue
       |                   AND ts >= TIMESTAMP '$McnCut' THEN 1 ELSE 0 END) AS h2
       |  FROM events GROUP BY 1),
       |cells AS (
       |  SELECT CAST(sum(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS yy,
       |         CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |         CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |         CAST(sum(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM pairs)
       |SELECT yy, b, c, nn,
       |       CASE WHEN b + c > 0 THEN
       |         floor(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
       |               / CAST(b + c AS DOUBLE) * 1000000 + 0.5) / 1000000.0
       |       END AS chi2,
       |       CAST(CASE WHEN (b - c) * (b - c) * 10000 > 38415 * (b + c)
       |                 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM cells""".stripMargin

  // ---------------------------------------------------------------- x313

  /** x313: Jonckheere–Terpstra — do order totals TREND with priority
    * (1-URGENT < 2-HIGH < … < 5-LOW is a genuine ordinal scale)? The
    * statistic is Σ over ordered group pairs g<h of the Mann–Whitney
    * count #{x_g < x_h} (+½ ties, kept doubled). Computed WITHOUT any
    * pair join: prices bucket to whole-dollar-÷100 values, the census
    * pivots to the five known priority columns, one cumulative window
    * per group gives #{x_g < v}, and all ten (g,h) U-counts are linear
    * sums over the census. E[2JT] = Σ_{g<h} n_g·n_h = (N² − Σn_g²)/2
    * (the ordered-pair count halved — exactly even, so the division is
    * lossless; an earlier draft used the UNhalved count and inflated
    * |z| ~40×, caught by a direct pair-fraction probe, not by the
    * oracle, which shared the bug — the parity gate proves Spark ==
    * DuckDB, never that either is the textbook). The z uses the
    * standard no-tie null variance [N²(2N+3) − Σn_g²(2n_g+3)]/72 —
    * documented approximation: bucketing introduces ties the classical
    * variance ignores (the exact integer 2jt/e2jt columns carry the
    * tie-free part of the contract).
    *
    * Scale: census size = price buckets (~5k), window + projection on
    * the census only; the full-table pass is one map-side-combinable
    * groupBy. */
  def jonckheere(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice) AS BIGINT) DIV 100").as("v"),
        substring($"o_orderpriority", 1, 1).as("g"))
      .groupBy($"v")
      .agg(sum(when($"g" === "1", 1L).otherwise(0L)).as("c1"),
        sum(when($"g" === "2", 1L).otherwise(0L)).as("c2"),
        sum(when($"g" === "3", 1L).otherwise(0L)).as("c3"),
        sum(when($"g" === "4", 1L).otherwise(0L)).as("c4"),
        sum(when($"g" === "5", 1L).otherwise(0L)).as("c5"))
    val w = Window.orderBy($"v").rowsBetween(Long.MinValue, -1)
    def cum(c: Column) = coalesce(sum(c).over(w), lit(0L))
    val cumd = census
      .withColumn("b1", cum($"c1")).withColumn("b2", cum($"c2"))
      .withColumn("b3", cum($"c3")).withColumn("b4", cum($"c4"))
    // doubled U_gh contribution at value v: c_h·(2·#{x_g < v} + c_g(v))
    val u = cumd.select(
      ($"c2" * (lit(2L) * $"b1" + $"c1") + $"c3" * (lit(2L) * $"b1" + $"c1")
        + $"c4" * (lit(2L) * $"b1" + $"c1") + $"c5" * (lit(2L) * $"b1" + $"c1")
        + $"c3" * (lit(2L) * $"b2" + $"c2") + $"c4" * (lit(2L) * $"b2" + $"c2")
        + $"c5" * (lit(2L) * $"b2" + $"c2")
        + $"c4" * (lit(2L) * $"b3" + $"c3") + $"c5" * (lit(2L) * $"b3" + $"c3")
        + $"c5" * (lit(2L) * $"b4" + $"c4")).as("u2v"),
      ($"c1" + $"c2" + $"c3" + $"c4" + $"c5").as("tv"),
      $"c1", $"c2", $"c3", $"c4", $"c5")
    val agg = u.agg(sum($"u2v").as("jt2"), sum($"tv").as("n"),
      sum($"c1").as("n1"), sum($"c2").as("n2"), sum($"c3").as("n3"),
      sum($"c4").as("n4"), sum($"c5").as("n5"))
    def d(c: Column) = c.cast("double")
    val sumSq = $"n1" * $"n1" + $"n2" * $"n2" + $"n3" * $"n3" +
      $"n4" * $"n4" + $"n5" * $"n5"
    val sumCube = $"n1" * $"n1" * (lit(2L) * $"n1" + 3L) +
      $"n2" * $"n2" * (lit(2L) * $"n2" + 3L) +
      $"n3" * $"n3" * (lit(2L) * $"n3" + 3L) +
      $"n4" * $"n4" * (lit(2L) * $"n4" + 3L) +
      $"n5" * $"n5" * (lit(2L) * $"n5" + 3L)
    val e2jt = ($"n" * $"n" - sumSq) / lit(2L) // exact: ordered pairs are even
    agg.select($"n", $"jt2", e2jt.cast("long").as("e2jt"),
      QueryUtil.halfUp4(
        (d($"jt2") - d(e2jt)) / 2.0
          / sqrt((d($"n") * d($"n") * d(lit(2L) * $"n" + 3L) - d(sumCube)) / 72.0))
        .as("z"))
  }

  private val jonckheereOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(floor(o_totalprice) AS BIGINT) // 100 AS v,
      |         CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |         CAST(sum(CASE WHEN o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |         CAST(sum(CASE WHEN o_orderpriority LIKE '3%' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |         CAST(sum(CASE WHEN o_orderpriority LIKE '4%' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |         CAST(sum(CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END) AS BIGINT) AS c5
      |  FROM orders GROUP BY 1),
      |cumd AS (
      |  SELECT *,
      |         COALESCE(sum(c1) OVER wb, 0) AS b1, COALESCE(sum(c2) OVER wb, 0) AS b2,
      |         COALESCE(sum(c3) OVER wb, 0) AS b3, COALESCE(sum(c4) OVER wb, 0) AS b4
      |  FROM census
      |  WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |agg AS (
      |  SELECT CAST(sum(c2 * (2 * b1 + c1) + c3 * (2 * b1 + c1)
      |             + c4 * (2 * b1 + c1) + c5 * (2 * b1 + c1)
      |             + c3 * (2 * b2 + c2) + c4 * (2 * b2 + c2) + c5 * (2 * b2 + c2)
      |             + c4 * (2 * b3 + c3) + c5 * (2 * b3 + c3)
      |             + c5 * (2 * b4 + c4)) AS BIGINT) AS jt2,
      |         CAST(sum(c1 + c2 + c3 + c4 + c5) AS BIGINT) AS n,
      |         CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
      |         CAST(sum(c3) AS BIGINT) AS n3, CAST(sum(c4) AS BIGINT) AS n4,
      |         CAST(sum(c5) AS BIGINT) AS n5
      |  FROM cumd)
      |SELECT n, jt2,
      |       (n * n - (n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5)) // 2 AS e2jt,
      |       floor((CAST(jt2 AS DOUBLE)
      |              - CAST((n * n - (n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5)) // 2
      |                     AS DOUBLE)) / 2.0
      |             / sqrt((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(2 * n + 3 AS DOUBLE)
      |                     - CAST(n1*n1*(2*n1+3) + n2*n2*(2*n2+3) + n3*n3*(2*n3+3)
      |                            + n4*n4*(2*n4+3) + n5*n5*(2*n5+3) AS DOUBLE)) / 72.0)
      |             * 10000 + 0.5) / 10000.0 AS z
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x310_kruskal_wallis",
      "Kruskal-Wallis H across return flags via the 50-value census: BIGINT doubled rank sums pivoted to one row, tie-corrected, exact sig flag",
      kruskalWallis, Some(kruskalWallisOracle)),
    QueryDef("x311_wilcoxon_signed_rank",
      "Wilcoxon signed-rank on per-part quantity shift between shipdate halves: census-ranked |d|, doubled W+, tie-corrected z",
      wilcoxonSignedRank, Some(wilcoxonOracle)),
    QueryDef("x312_mcnemar",
      "McNemar paired-binary test on per-user purchase flips across the timeline split: exact discordant cells, cross-multiplied sig",
      mcnemar, Some(mcnemarOracle)),
    QueryDef("x313_jonckheere",
      "Jonckheere-Terpstra ordered trend across the five priorities: ten pairwise U-counts as linear census sums, no pair join",
      jonckheere, Some(jonckheereOracle)))
}
