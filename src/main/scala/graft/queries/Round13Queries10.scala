package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 tenth tier: stratified-association and multi-rater-agreement
  * statistics — the Mantel–Haenszel pooled odds ratio with its χ² test
  * (the epidemiology/experimentation standard for combining 2×2 tables
  * across confounder strata, here ship-year strata) and Fleiss' kappa
  * (chance-corrected agreement for ≥ 3 raters, generalizing x114's
  * two-rater Cohen kappa). MH's per-stratum rational terms are
  * micro-quantized with truncating division (x330 convention, products
  * in DECIMAL(38)/HUGEINT); Fleiss runs on pure BIGINT censuses.
  */
object Round13Queries10 {

  /** χ²(1, 0.05) critical value for the MH test. */
  private val Chi2Crit1 = 3.841458821
  /** Fixed-point scale for the MH rational terms (micro-units). */
  private val MhScale = 1000000L

  // ---------------------------------------------------------------- x335

  /** x335: Mantel–Haenszel — is a deep discount (> 0.05) associated with
    * returns (flag 'R'), pooled across ship-year strata so a year-level
    * confounder (campaign years with both more discounts and more
    * returns) cannot fake the association? Per-stratum 2×2 cells
    * (a = discounted∧returned … d) are census counts; the MH terms
    * aᵢdᵢ/nᵢ, bᵢcᵢ/nᵢ, the expectation (a+b)(a+c)/nᵢ and the variance
    * (a+b)(c+d)(a+c)(b+d)/(nᵢ²(nᵢ−1)) are quantized to micro-units with
    * truncating division — every product in DECIMAL(38)/HUGEINT since
    * the 4-way variance product overflows BIGINT at ~10⁵ rows/stratum.
    * OR_MH = Σad/n ÷ Σbc/n; χ²_MH = (Σa·10⁶ − ΣE_q)²/(10⁶·ΣV_q)
    * (no continuity correction), flagged against χ²₀.₀₅,₁.
    *
    * Scale: one map-side-combinable groupBy(year) corpus pass; the MH
    * algebra runs on the ≤ 7-row stratum frame with window-sums. */
  def mantelHaenszel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.lineitem(spark, dir)
      .select(year($"l_shipdate").cast("long").as("yr"),
        ($"l_discount" > 0.05).as("e"), ($"l_returnflag" === "R").as("o"))
      .groupBy($"yr").agg(
        sum(when($"e" && $"o", 1L).otherwise(0L)).as("a"),
        sum(when($"e" && !$"o", 1L).otherwise(0L)).as("b"),
        sum(when(!$"e" && $"o", 1L).otherwise(0L)).as("c"),
        sum(when(!$"e" && !$"o", 1L).otherwise(0L)).as("d"))
      .withColumn("n", $"a" + $"b" + $"c" + $"d")
      // a 1-row stratum has Var = x/0: Spark DIV yields null while DuckDB
      // // errors — exclude degenerate strata identically on both sides
      .filter($"n" >= 2L)
    def dec(s: String) = s"CAST($s AS DECIMAL(38,0))"
    val terms = cells
      .withColumn("adn", expr(
        s"CAST((${dec("a")} * ${dec("d")} * $MhScale) DIV ${dec("n")} AS BIGINT)"))
      .withColumn("bcn", expr(
        s"CAST((${dec("b")} * ${dec("c")} * $MhScale) DIV ${dec("n")} AS BIGINT)"))
      .withColumn("e_q", expr(
        s"CAST((${dec("a + b")} * ${dec("a + c")} * $MhScale) DIV ${dec("n")} AS BIGINT)"))
      .withColumn("v_q", expr(
        s"CAST((${dec("a + b")} * ${dec("c + d")} * ${dec("a + c")} * ${dec("b + d")} * $MhScale)" +
          s" DIV (${dec("n")} * ${dec("n")} * ${dec("n - 1")}) AS BIGINT)"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val g = terms
      .withColumn("s_adn", sum($"adn").over(wAll))
      .withColumn("s_bcn", sum($"bcn").over(wAll))
      .withColumn("s_a", sum($"a").over(wAll))
      .withColumn("s_e", sum($"e_q").over(wAll))
      .withColumn("s_v", sum($"v_q").over(wAll))
    def db(c: Column) = c.cast("double")
    val orMh = db($"s_adn") / db($"s_bcn")
    val diff = db($"s_a") * lit(MhScale.toDouble) - db($"s_e")
    val chi2 = diff * diff / (lit(MhScale.toDouble) * db($"s_v"))
    g.select($"yr", $"a", $"b", $"c", $"d", $"adn", $"bcn", $"e_q", $"v_q",
      QueryUtil.halfUp4(orMh).as("or_mh"),
      QueryUtil.halfUp4(chi2).as("chi2_mh"),
      when(chi2 > Chi2Crit1, 1L).otherwise(0L).as("sig"))
      .orderBy($"yr")
  }

  private val mantelHaenszelOracle =
    s"""WITH cells AS MATERIALIZED (
       |  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
       |         CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |         CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |         CAST(sum(CASE WHEN l_discount <= 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |         CAST(sum(CASE WHEN l_discount <= 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM lineitem GROUP BY 1
       |  HAVING a + b + c + d >= 2),
       |terms AS (
       |  SELECT *, a + b + c + d AS n,
       |         CAST((CAST(a AS HUGEINT) * d * $MhScale) // (a + b + c + d) AS BIGINT) AS adn,
       |         CAST((CAST(b AS HUGEINT) * c * $MhScale) // (a + b + c + d) AS BIGINT) AS bcn,
       |         CAST((CAST(a + b AS HUGEINT) * (a + c) * $MhScale) // (a + b + c + d) AS BIGINT) AS e_q,
       |         CAST((CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) * $MhScale)
       |              // (CAST(a + b + c + d AS HUGEINT) * (a + b + c + d) * (a + b + c + d - 1)) AS BIGINT) AS v_q
       |  FROM cells),
       |g AS (
       |  SELECT *,
       |         sum(adn) OVER () AS s_adn, sum(bcn) OVER () AS s_bcn,
       |         sum(a) OVER () AS s_a, sum(e_q) OVER () AS s_e, sum(v_q) OVER () AS s_v
       |  FROM terms),
       |stat AS (
       |  SELECT *,
       |         CAST(s_adn AS DOUBLE) / CAST(s_bcn AS DOUBLE) AS or_raw,
       |         (CAST(s_a AS DOUBLE) * $MhScale.0 - CAST(s_e AS DOUBLE))
       |         * (CAST(s_a AS DOUBLE) * $MhScale.0 - CAST(s_e AS DOUBLE))
       |         / ($MhScale.0 * CAST(s_v AS DOUBLE)) AS chi2_raw
       |  FROM g)
       |SELECT yr, a, b, c, d, adn, bcn, e_q, v_q,
       |       floor(or_raw * 10000 + 0.5) / 10000.0 AS or_mh,
       |       floor(chi2_raw * 10000 + 0.5) / 10000.0 AS chi2_mh,
       |       CAST(CASE WHEN chi2_raw > $Chi2Crit1 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM stat ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- x336

  /** The three deterministic "raters": each bins a document into
    * {s, m, l} by n_chars with DIFFERENT cut points, so they agree on
    * clear cases and disagree near the boundaries — a fixed, replayable
    * panel standing in for human annotators. */
  private val RaterCuts = Seq((150L, 300L), (170L, 280L), (130L, 330L))

  /** x336: Fleiss' kappa — chance-corrected agreement of a 3-rater panel
    * binning documents into short/medium/long. Per item the category
    * counts n_ic ∈ {0..3} come straight off the three threshold raters;
    * the agreement mass S2 = ΣᵢΣ_c n_ic², the category margins C_c and
    * the item count N are the whole sufficient statistic — all BIGINT.
    * κ = (P̄ − P̄ₑ)/(1 − P̄ₑ) with P̄ = (S2 − N·n)/(N·n(n−1)),
    * P̄ₑ = Σ_c (C_c/(N·n))², computed as one identical double projection.
    * Generalizes x114 (Cohen, 2 raters) to the panel setting used for
    * LLM-judge agreement audits.
    *
    * Scale: single map-side-combinable aggregate over documents; no
    * joins, no shuffle beyond the one-row agg. */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cat(cuts: (Long, Long)) =
      when($"n_chars" < cuts._1, "s").when($"n_chars" < cuts._2, "m").otherwise("l")
    val rated = Tables.documents(spark, dir)
      .select(cat(RaterCuts(0)).as("c1"), cat(RaterCuts(1)).as("c2"),
        cat(RaterCuts(2)).as("c3"))
    def nc(catName: String): Column =
      (when($"c1" === catName, 1L).otherwise(0L) +
        when($"c2" === catName, 1L).otherwise(0L) +
        when($"c3" === catName, 1L).otherwise(0L))
    val perItem = rated.select(nc("s").as("ns"), nc("m").as("nm"), nc("l").as("nl"))
    val agg = perItem.agg(
      count(lit(1)).as("n_items"),
      sum($"ns" * $"ns" + $"nm" * $"nm" + $"nl" * $"nl").as("s2"),
      sum($"ns").as("c_s"), sum($"nm").as("c_m"), sum($"nl").as("c_l"))
    def d(c: Column) = c.cast("double")
    val nn = d($"n_items") * lit(3.0)
    val pbar = (d($"s2") - nn) / (nn * lit(2.0))
    val pe = (d($"c_s") / nn) * (d($"c_s") / nn) + (d($"c_m") / nn) * (d($"c_m") / nn) +
      (d($"c_l") / nn) * (d($"c_l") / nn)
    val kappa = (pbar - pe) / (lit(1.0) - pe)
    agg.select($"n_items", $"s2", $"c_s", $"c_m", $"c_l",
      QueryUtil.halfUp4(pbar).as("p_bar"),
      QueryUtil.halfUp4(kappa).as("kappa"))
  }

  private val fleissKappaOracle = {
    def cat(lo: Long, hi: Long) =
      s"CASE WHEN n_chars < $lo THEN 's' WHEN n_chars < $hi THEN 'm' ELSE 'l' END"
    val (r1, r2, r3) = (cat(RaterCuts(0)._1, RaterCuts(0)._2),
      cat(RaterCuts(1)._1, RaterCuts(1)._2), cat(RaterCuts(2)._1, RaterCuts(2)._2))
    s"""WITH rated AS MATERIALIZED (
       |  SELECT $r1 AS c1, $r2 AS c2, $r3 AS c3 FROM documents),
       |per_item AS (
       |  SELECT (CASE WHEN c1 = 's' THEN 1 ELSE 0 END + CASE WHEN c2 = 's' THEN 1 ELSE 0 END
       |          + CASE WHEN c3 = 's' THEN 1 ELSE 0 END) AS ns,
       |         (CASE WHEN c1 = 'm' THEN 1 ELSE 0 END + CASE WHEN c2 = 'm' THEN 1 ELSE 0 END
       |          + CASE WHEN c3 = 'm' THEN 1 ELSE 0 END) AS nm,
       |         (CASE WHEN c1 = 'l' THEN 1 ELSE 0 END + CASE WHEN c2 = 'l' THEN 1 ELSE 0 END
       |          + CASE WHEN c3 = 'l' THEN 1 ELSE 0 END) AS nl
       |  FROM rated),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_items,
       |         CAST(sum(ns * ns + nm * nm + nl * nl) AS BIGINT) AS s2,
       |         CAST(sum(ns) AS BIGINT) AS c_s, CAST(sum(nm) AS BIGINT) AS c_m,
       |         CAST(sum(nl) AS BIGINT) AS c_l
       |  FROM per_item),
       |stat AS (
       |  SELECT *,
       |         (CAST(s2 AS DOUBLE) - CAST(n_items AS DOUBLE) * 3.0)
       |           / (CAST(n_items AS DOUBLE) * 3.0 * 2.0) AS pbar_raw,
       |         (CAST(c_s AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
       |           * (CAST(c_s AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
       |         + (CAST(c_m AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
       |           * (CAST(c_m AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
       |         + (CAST(c_l AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
       |           * (CAST(c_l AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0)) AS pe_raw
       |  FROM agg)
       |SELECT n_items, s2, c_s, c_m, c_l,
       |       floor(pbar_raw * 10000 + 0.5) / 10000.0 AS p_bar,
       |       floor((pbar_raw - pe_raw) / (1.0 - pe_raw) * 10000 + 0.5) / 10000.0 AS kappa
       |FROM stat""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x335_mantel_haenszel",
      "Mantel-Haenszel pooled odds ratio + chi2 across ship-year strata: micro-quantized rational terms, HUGEINT products",
      mantelHaenszel, Some(mantelHaenszelOracle)),
    QueryDef("x336_fleiss_kappa",
      "Fleiss' kappa for a 3-rater threshold panel over documents: BIGINT agreement census, generalizes Cohen's kappa",
      fleissKappa, Some(fleissKappaOracle)))
}
