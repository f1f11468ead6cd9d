package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 thirty-second tier: rank-based feature normalization
  * (x195), inverse-propensity recovery over the x188 thinning (x196),
  * and the right-to-be-forgotten cascade report (q112). */
object Round10Queries32 {

  // ---------------------------------------------------------------- x195

  /** x195: quantile (rank) normalization of a feature — map each value
    * to its corpus percent-rank, the transform that makes any two
    * features comparable regardless of their marginal distributions
    * (the rank trick behind quantile-normalized features and
    * copula-style preprocessing). Computed the DISTRIBUTED way: one
    * histogram over distinct values, one prefix-sum window over that
    * (vocab-bounded) histogram — min-rank semantics for ties — then a
    * broadcast join back; no global sort of the data itself. The
    * output certifies the defining property: per language, the
    * normalized deciles are near-uniform even though raw lengths are
    * anything but.
    *
    * Scale: the window runs over DISTINCT feature values (hundreds),
    * not rows; the data-sized work is one groupBy and one map-side
    * broadcast join — at 100 TB the rank table is still tiny. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"lang",
      $"n_chars".cast("long").as("x"))
    val hist = docs.groupBy($"x").agg(count(lit(1)).as("c"))
    val w = Window.orderBy($"x").rowsBetween(Window.unboundedPreceding, -1)
    val ranks = hist.select($"x",
      (coalesce(sum($"c").over(w), lit(0L)) + 1L).as("rk"))
    val n = docs.agg(count(lit(1)).as("n"))
    val normalized = docs.join(broadcast(ranks), "x")
      .crossJoin(broadcast(n))
      .select($"lang",
        least(expr("(((rk - 1) * 1000000) div (n - 1)) div 100000"), lit(9L))
          .as("decile"))
    normalized.groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"decile")
  }

  private val quantileOracle =
    """WITH docs AS (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
      |hist AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY x),
      |ranks AS (SELECT x,
      |            CAST(COALESCE(sum(c) OVER (ORDER BY x
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
      |              AS BIGINT) AS rk
      |          FROM hist),
      |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
      |norm AS (SELECT lang,
      |           least((((rk - 1) * 1000000) // (n - 1)) // 100000, 9) AS decile
      |         FROM docs JOIN ranks USING (x), n0)
      |SELECT lang, CAST(decile AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM norm GROUP BY lang, decile
      |ORDER BY lang, decile""".stripMargin

  // ---------------------------------------------------------------- x196

  /** x196: inverse-propensity recovery — proves the x188 thinned sample
    * is USABLE for unbiased corpus estimates. Per length bucket: the
    * true count, the naive extrapolation (sample share × corpus size —
    * biased ~10% low on thinned buckets because the sample over-
    * represents pass-through buckets), and the Horvitz–Thompson IPW
    * estimate Σ 1/p over sampled rows (measured within ~1% of truth).
    * Selection probabilities are the x188 ratios, so the weights are
    * exact fixed-point rationals, not fitted propensities.
    *
    * Scale: two histogram passes and a broadcast ratio join — the
    * estimator adds nothing data-sized beyond the sampler itself. The
    * lesson carries: any downstream consumer of a thinned corpus can
    * weight by the stored admission ratio instead of re-reading the
    * full corpus. */
  def ipwRecovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id",
      when($"n_chars" < 150, 0L).when($"n_chars" < 300, 1L)
        .when($"n_chars" < 450, 2L).otherwise(3L).as("bucket"))
    val before = docs.groupBy($"bucket").agg(count(lit(1)).as("n_before"))
    val total = before.agg(sum($"n_before").as("nn"))
    val ratios = before.crossJoin(broadcast(total))
      .select($"bucket", $"n_before", $"nn",
        least(lit(1000000L), expr("(nn * 1000000) div (4 * n_before)")).as("ratio_fp"))
    val h1 = pmod(pmod($"doc_id" * 7919L + lit(7L), lit(1048576L)) * 2654435761L,
      lit(2147483648L))
    val h3 = pmod(h1.bitwiseXOR(shiftright(h1, 13)) * 2246822519L, lit(2147483648L))
    val kept = docs
      .select($"bucket", pmod(h3.bitwiseXOR(shiftright(h3, 16)), lit(1000000L)).as("u"))
      .join(broadcast(ratios.select($"bucket", $"ratio_fp")), "bucket")
      .filter($"u" < $"ratio_fp")
      .groupBy($"bucket").agg(count(lit(1)).as("n_kept"))
    val keptTotal = kept.agg(sum($"n_kept").as("kk"))
    ratios.join(kept, "bucket").crossJoin(broadcast(keptTotal))
      .select($"bucket", $"n_before", $"n_kept", $"ratio_fp",
        expr("(n_kept * nn) div kk").as("naive_est"),
        expr("(n_kept * 1000000) div ratio_fp").as("ipw_est"))
      .select($"bucket", $"n_before", $"n_kept", $"ratio_fp",
        $"naive_est", $"ipw_est",
        abs($"naive_est" - $"n_before").as("err_naive"),
        abs($"ipw_est" - $"n_before").as("err_ipw"))
      .orderBy($"bucket")
  }

  private val ipwOracle =
    """WITH docs AS (SELECT doc_id,
      |    CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1
      |         WHEN n_chars < 450 THEN 2 ELSE 3 END AS bucket
      |  FROM documents),
      |b0 AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_before FROM docs GROUP BY bucket),
      |tot AS (SELECT CAST(sum(n_before) AS BIGINT) AS nn FROM b0),
      |ratios AS (SELECT bucket, n_before, nn,
      |             least(1000000, (nn * 1000000) // (4 * n_before)) AS ratio_fp
      |           FROM b0, tot),
      |mixed AS (SELECT bucket, xor(h3, h3 >> 16) % 1000000 AS u FROM (
      |    SELECT bucket, (xor(h1, h1 >> 13) * 2246822519) % 2147483648 AS h3 FROM (
      |      SELECT bucket, ((doc_id * 7919 + 7) % 1048576 * 2654435761)
      |                       % 2147483648 AS h1 FROM docs) a) b),
      |kept AS (SELECT m.bucket, CAST(count(*) AS BIGINT) AS n_kept
      |         FROM mixed m JOIN ratios r ON m.bucket = r.bucket
      |         WHERE m.u < r.ratio_fp GROUP BY m.bucket),
      |kt AS (SELECT CAST(sum(n_kept) AS BIGINT) AS kk FROM kept)
      |SELECT r.bucket, r.n_before, k.n_kept, CAST(r.ratio_fp AS BIGINT) AS ratio_fp,
      |       CAST((k.n_kept * r.nn) // kk AS BIGINT) AS naive_est,
      |       CAST((k.n_kept * 1000000) // r.ratio_fp AS BIGINT) AS ipw_est,
      |       CAST(abs((k.n_kept * r.nn) // kk - r.n_before) AS BIGINT) AS err_naive,
      |       CAST(abs((k.n_kept * 1000000) // r.ratio_fp - r.n_before) AS BIGINT) AS err_ipw
      |FROM ratios r JOIN kept k ON k.bucket = r.bucket, kt
      |ORDER BY r.bucket""".stripMargin

  // ---------------------------------------------------------------- q112

  /** q112: right-to-be-forgotten cascade report — given a deletion
    * cohort (customers with custkey ≡ 0 mod 97), the blast radius
    * across the schema BEFORE any tombstone is written: affected
    * orders, affected line items (reached transitively through orders),
    * and each table's affected per-mille. This is the impact estimate a
    * governance pipeline runs to size a GDPR erasure batch and to
    * schedule the rewrite (x144's diff-apply is the mechanism; this is
    * its planning query).
    *
    * Scale: the cohort is broadcast; orders filter map-side; lineitem
    * reaches the cohort through a semi-join on o_orderkey — no full
    * shuffle of any fact table, and the transitive reach pattern
    * extends to any star schema depth. */
  def deleteCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey")
    val cohort = cust.filter(pmod($"c_custkey", lit(97L)) === 0L)
      .select($"c_custkey".as("k")).localCheckpoint(true)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val affOrders = orders.join(broadcast(cohort), $"o_custkey" === $"k")
      .select($"o_orderkey").localCheckpoint(true)
    val counts = Seq(
      ("customer", cust.count(), cohort.count()),
      ("orders", orders.count(), affOrders.count()),
      ("lineitem", li.count(),
        li.join(broadcast(affOrders), $"l_orderkey" === $"o_orderkey", "left_semi")
          .count()))
    spark.createDataFrame(counts).toDF("table_name", "n_rows", "n_affected")
      .select($"table_name", $"n_rows", $"n_affected",
        expr("(n_affected * 1000) div n_rows").as("per_mille"))
      .orderBy($"table_name")
  }

  private val cascadeOracle =
    """WITH cohort AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |aff_orders AS (SELECT o_orderkey FROM orders
      |               WHERE o_custkey IN (SELECT c_custkey FROM cohort)),
      |rows0 AS (
      |  SELECT 'customer' AS table_name,
      |         CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_rows,
      |         CAST((SELECT count(*) FROM cohort) AS BIGINT) AS n_affected
      |  UNION ALL
      |  SELECT 'lineitem',
      |         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
      |         CAST((SELECT count(*) FROM lineitem
      |               WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)) AS BIGINT)
      |  UNION ALL
      |  SELECT 'orders',
      |         CAST((SELECT count(*) FROM orders) AS BIGINT),
      |         CAST((SELECT count(*) FROM aff_orders) AS BIGINT))
      |SELECT table_name, n_rows, n_affected,
      |       CAST((n_affected * 1000) // n_rows AS BIGINT) AS per_mille
      |FROM rows0 ORDER BY table_name""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x195_quantile_normalize",
      "rank/quantile normalization via histogram prefix-sum (window over distinct values, not rows); per-lang decile uniformity",
      quantileNormalize, Some(quantileOracle)),
    QueryDef("x196_ipw_recovery",
      "Horvitz-Thompson recovery over the x188 thinning: IPW per-bucket counts land ~1% of truth where naive extrapolation is ~10% off",
      ipwRecovery, Some(ipwOracle)),
    QueryDef("q112_delete_cascade",
      "right-to-be-forgotten blast radius: affected rows and per-mille across customer -> orders -> lineitem",
      deleteCascade, Some(cascadeOracle)))
}
