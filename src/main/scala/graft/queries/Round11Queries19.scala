package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 nineteenth tier: the exact two-sample Kolmogorov–Smirnov
  * test — x270's Mann–Whitney asks "is one sample shifted?"; KS asks
  * "do the two distributions differ ANYWHERE?". The statistic, its
  * argmax location, and the α=0.05 decision are all exact integer
  * arithmetic over the value census (D as a cross-multiplied BIGINT
  * numerator over the common denominator n₁·n₂; the decision squares
  * it against 1.358²·(n₁+n₂)·n₁·n₂ in DECIMAL(38)/HUGEINT).
  */
object Round11Queries19 {

  /** KS α=0.05 coefficient: c(α)² = 1.358² as an exact rational,
    * reduced to lowest terms (1844164/1000000, gcd 4) so the
    * cross-multiplied predicate carries a 4× smaller left factor. */
  private val KsC2Num = 461041L
  private val KsC2Den = 250000L

  // ---------------------------------------------------------------- x285

  /** x285: exact two-sample KS — `en` vs non-`en` document lengths.
    * One census pass (value → per-sample counts), one running-sum
    * window, then `D·n₁·n₂ = max_v |F₁num(v)·n₂ − F₂num(v)·n₁|` as an
    * exact BIGINT with the smallest attaining value as the
    * deterministic argmax; reject at 5% iff
    * `(D·n₁·n₂)²·25·10⁴ > 461041·n₁·n₂·(n₁+n₂)` — one cross-multiplied
    * DECIMAL(38)/HUGEINT predicate, no sqrt, no float accumulation.
    *
    * Exact-arithmetic validity bound: the left side is `dnum²·2.5e5`
    * with `dnum ≤ n₁·n₂`, so DECIMAL(38) (≤ ~1e38) holds it exactly
    * while `n₁·n₂ ≤ 2·10¹⁶` — i.e. up to ~1.4·10⁸ documents per class
    * (DuckDB's HUGEINT bound is the same order). Beyond that the
    * predicate needs arbitrary precision (a BigInt typed aggregate on
    * the one surviving row); the statistic D itself never overflows
    * since dnum stays a BIGINT product of two in-range counts
    * (ADVICE r11).
    *
    * Delta vs q80 (which already ships the per-return-flag D
    * statistic): this adds what a DECISION needs and q80 does not emit
    * — the exact argmax LOCATION (where the distributions diverge
    * most, the actionable part of a drift alarm) and the α=0.05
    * accept/reject evaluated entirely in integer arithmetic, the same
    * exact-predicate discipline as q104/x281.
    *
    * Scale: the census recipe — the corpus pass is one group-by, the
    * sup runs over |distinct values| rows. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.documents(spark, dir)
      .filter($"n_chars" > 0)
      .select($"n_chars".cast("long").as("v"),
        when($"lang" === "en", 1L).otherwise(0L).as("is1"))
      .groupBy($"v").agg(sum($"is1").as("c1"),
        sum(lit(1L) - $"is1").as("c2"))
      .localCheckpoint(true)
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
    val tot = census.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    val cum = census
      .withColumn("f1", sum($"c1").over(w))
      .withColumn("f2", sum($"c2").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("dnum", abs($"f1" * $"n2" - $"f2" * $"n1"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cum
      .withColumn("rn", row_number().over(Window.orderBy($"dnum".desc, $"v")))
      .filter($"rn" === 1)
      .select($"n1", $"n2", $"dnum".as("d_num"), $"v".as("at_value"),
        QueryUtil.halfUp($"dnum".cast("double")
          / ($"n1".cast("double") * $"n2".cast("double")), 6).as("d"),
        (dec($"dnum") * dec($"dnum") * lit(KsC2Den)
          > lit(KsC2Num) * dec($"n1") * dec($"n2") * (dec($"n1") + dec($"n2")))
          .cast("long").as("reject_5pct"))
  }

  private val ksTestOracle =
    s"""WITH census AS MATERIALIZED (
       |  SELECT CAST(n_chars AS BIGINT) AS v,
       |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS c2
       |  FROM documents WHERE n_chars > 0 GROUP BY 1),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
       |               CAST(sum(c2) AS BIGINT) AS n2 FROM census),
       |cum AS (
       |  SELECT v,
       |         CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |           AS BIGINT) AS f1,
       |         CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |           AS BIGINT) AS f2,
       |         n1, n2
       |  FROM census, tot),
       |scored AS (
       |  SELECT v, n1, n2, abs(f1 * n2 - f2 * n1) AS dnum,
       |         row_number() OVER (ORDER BY abs(f1 * n2 - f2 * n1) DESC, v) AS rn
       |  FROM cum)
       |SELECT n1, n2, dnum AS d_num, v AS at_value,
       |       floor(CAST(dnum AS DOUBLE)
       |             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
       |             * 1000000 + 0.5) / 1000000.0 AS d,
       |       CAST(CASE WHEN CAST(dnum AS HUGEINT) * CAST(dnum AS HUGEINT)
       |                      * $KsC2Den
       |                    > $KsC2Num * CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT)
       |                      * (CAST(n1 AS HUGEINT) + CAST(n2 AS HUGEINT))
       |                 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
       |FROM scored WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x285_ks_test",
      "exact two-sample Kolmogorov-Smirnov over the value census with HUGEINT decision",
      ksTest, Some(ksTestOracle)))
}
