package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 eleventh tier: the two inference staples that complete the
  * observational-comparison story — direct standardization (x267's
  * Simpson screen DETECTS confounding; this ADJUSTS for it by
  * reweighting per-stratum rates to the pooled stratum distribution)
  * and the Mann–Whitney rank-sum test with exact tie correction (the
  * nonparametric two-sample location test next to q87's runs test and
  * the Kendall/pinball rank family). Per-stratum terms are quantized to
  * fixed point BEFORE summation (order-free BIGINT), ranks and tie
  * corrections are exact integers; the only doubles are final ratios of
  * identical integers.
  */
object Round11Queries11 {

  /** Fixed-point scale for standardized-rate terms. */
  private val AteScale = "1000000000000.0" // 1e12, exactly representable

  // ---------------------------------------------------------------- x269

  /** x269: direct standardization — the confounder-adjusted comparison
    * x267 motivates: the AUTOMOBILE-vs-BUILDING urgent-rate difference,
    * first crude (pooled), then standardized over order-year strata
    * with the pooled stratum sizes as weights:
    * `Δ_std = Σ_s n_s·(rA_s − rB_s) / N`. Each stratum's term is an
    * exact double from integer ratios, quantized half-up to 1e-12
    * BIGINT units before the cross-stratum sum — integer sums are
    * accumulation-order-free, so Spark's partitioned fold equals
    * DuckDB's sequential one bit-for-bit. Emits both differences and
    * the confounding gap between them.
    *
    * Scale: one broadcast-dim join, one stratum group-by, one 7-row
    * fold — the standardization itself is O(strata) post-aggregation
    * arithmetic regardless of corpus size. */
  def standardizedAte(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .select(year($"o_orderdate").cast("long").as("yr"),
        ($"c_mktsegment" === "AUTOMOBILE").as("is_a"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("u"))
    val strata = base.groupBy($"yr").agg(
      sum(when($"is_a", 1L).otherwise(0L)).as("na"),
      sum(when($"is_a", $"u").otherwise(0L)).as("ua"),
      sum(when(!$"is_a", 1L).otherwise(0L)).as("nb"),
      sum(when(!$"is_a", $"u").otherwise(0L)).as("ub"))
      .filter($"na" > 0 && $"nb" > 0)
    val term = ($"na" + $"nb").cast("double") *
      ($"ua".cast("double") / $"na".cast("double")
        - $"ub".cast("double") / $"nb".cast("double"))
    strata.agg(
      count(lit(1)).as("n_strata"),
      sum($"na" + $"nb").as("n_total"),
      sum($"na").as("na"), sum($"ua").as("ua"),
      sum($"nb").as("nb"), sum($"ub").as("ub"),
      sum(floor(term * lit(AteScale.toDouble) + 0.5).cast("long")).as("std_q"))
      .select($"n_strata", $"n_total", $"na", $"ua", $"nb", $"ub",
        QueryUtil.halfUp(
          $"ua".cast("double") / $"na".cast("double")
            - $"ub".cast("double") / $"nb".cast("double"), 6).as("crude_diff"),
        QueryUtil.halfUp(
          ($"std_q".cast("double") / lit(AteScale.toDouble))
            / $"n_total".cast("double"), 6).as("std_diff"),
        $"std_q")
  }

  private val standardizedAteOracle =
    s"""WITH base AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       |         c_mktsegment = 'AUTOMOBILE' AS is_a,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
       |strata AS MATERIALIZED (
       |  SELECT yr,
       |         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |         CAST(sum(CASE WHEN is_a THEN u ELSE 0 END) AS BIGINT) AS ua,
       |         CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |         CAST(sum(CASE WHEN NOT is_a THEN u ELSE 0 END) AS BIGINT) AS ub
       |  FROM base GROUP BY yr
       |  HAVING sum(CASE WHEN is_a THEN 1 ELSE 0 END) > 0
       |     AND sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) > 0),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
       |         CAST(sum(na + nb) AS BIGINT) AS n_total,
       |         CAST(sum(na) AS BIGINT) AS na, CAST(sum(ua) AS BIGINT) AS ua,
       |         CAST(sum(nb) AS BIGINT) AS nb, CAST(sum(ub) AS BIGINT) AS ub,
       |         CAST(sum(CAST(floor(
       |             CAST(na + nb AS DOUBLE)
       |             * (CAST(ua AS DOUBLE) / CAST(na AS DOUBLE)
       |                - CAST(ub AS DOUBLE) / CAST(nb AS DOUBLE))
       |             * $AteScale + 0.5) AS BIGINT)) AS BIGINT) AS std_q
       |  FROM strata)
       |SELECT n_strata, n_total, na, ua, nb, ub,
       |       floor((CAST(ua AS DOUBLE) / CAST(na AS DOUBLE)
       |              - CAST(ub AS DOUBLE) / CAST(nb AS DOUBLE))
       |             * 1000000 + 0.5) / 1000000.0 AS crude_diff,
       |       floor((CAST(std_q AS DOUBLE) / $AteScale) / CAST(n_total AS DOUBLE)
       |             * 1000000 + 0.5) / 1000000.0 AS std_diff,
       |       std_q
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- x270

  /** x270: Mann–Whitney rank-sum test with exact tie handling — does
    * the length distribution of `en` documents differ in location from
    * the rest of the corpus? Average ranks over tie groups are exact
    * half-integers derived from per-VALUE counts (group by value, one
    * running sum over the value-ordered census — never a per-row global
    * sort), so `2·R_A` and `2·U` are exact BIGINTs; the tie-corrected
    * variance uses the exact `Σ(t³−t)` BIGINT; the z-score is the only
    * double (IEEE-exact sqrt/divide of identical integers).
    *
    * Delta vs q79 (which already ships MW per return flag): q79's rank
    * window runs over the RAW combined sample — O(rows) per partition;
    * here the entire rank computation runs on the value CENSUS
    * (average ranks reconstructed from per-value counts + one running
    * sum over |distinct| rows), the formulation that stays cheap when
    * one partition holds 10⁹ rows over 10⁴ distinct values.
    *
    * Scale: the corpus pass is one group-by-value census; everything
    * after runs on |distinct values| rows. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.documents(spark, dir)
      .filter($"n_chars" > 0)
      .select($"n_chars".cast("long").as("v"),
        when($"lang" === "en", 1L).otherwise(0L).as("a"))
      .groupBy($"v").agg(count(lit(1)).as("t"), sum($"a").as("ta"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"v").rowsBetween(Long.MinValue, -1)
    val ranked = census
      .withColumn("cum_before", coalesce(sum($"t").over(w), lit(0L)))
      // 2 * average rank of the tie group = 2*cum_before + t + 1 (exact)
      .withColumn("r2", lit(2L) * $"cum_before" + $"t" + 1L)
    val agg = ranked.agg(
      sum($"t").as("n"), sum($"ta").as("na"),
      sum($"ta" * $"r2").as("ra2"),
      sum($"t" * $"t" * $"t" - $"t").as("tie3"))
    agg.select(
      $"n", $"na", ($"n" - $"na").as("nb"), $"ra2", $"tie3",
      // 2U = 2*R_A - nA*(nA+1)
      ($"ra2" - $"na" * ($"na" + 1L)).as("u2"))
      .select($"n", $"na", $"nb", $"ra2", $"tie3", $"u2",
        ($"u2".cast("double") / 2.0).as("u"),
        // mean(U) = nA*nB/2; var(U) = nA*nB/12 * ((n+1) - tie3/(n(n-1)))
        QueryUtil.halfUp4(
          ($"u2".cast("double") / 2.0
            - $"na".cast("double") * $"nb".cast("double") / 2.0)
            / sqrt($"na".cast("double") * $"nb".cast("double") / 12.0
              * (($"n" + 1L).cast("double")
                - $"tie3".cast("double")
                  / ($"n".cast("double") * ($"n" - 1L).cast("double")))))
          .as("z"))
  }

  private val mannWhitneyOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ta
      |  FROM documents WHERE n_chars > 0 GROUP BY 1),
      |ranked AS (
      |  SELECT v, t, ta,
      |         COALESCE(sum(t) OVER (ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM census),
      |agg AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(ta) AS BIGINT) AS na,
      |         CAST(sum(ta * (2 * cum_before + t + 1)) AS BIGINT) AS ra2,
      |         CAST(sum(t * t * t - t) AS BIGINT) AS tie3
      |  FROM ranked)
      |SELECT n, na, n - na AS nb, ra2, tie3,
      |       ra2 - na * (na + 1) AS u2,
      |       CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0 AS u,
      |       floor((CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0
      |              - CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 2.0)
      |             / sqrt(CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE) / 12.0
      |                    * (CAST(n + 1 AS DOUBLE)
      |                       - CAST(tie3 AS DOUBLE)
      |                         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
      |             * 10000 + 0.5) / 10000.0 AS z
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x269_standardized_ate",
      "direct standardization over year strata: crude vs confounder-adjusted rate difference",
      standardizedAte, Some(standardizedAteOracle)),
    QueryDef("x270_mann_whitney",
      "Mann-Whitney rank-sum via value census (exact half-integer ranks, BIGINT tie correction)",
      mannWhitney, Some(mannWhitneyOracle)))
}
