package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 fifth tier: Holm's step-down procedure on x293's exact
  * permutation p-values (completing the multiple-testing family x294's
  * BH opened), the two-sample ENERGY statistic from census prefix sums
  * (a pairwise-defined distance computed without a pair join), and the
  * Gini decision stump (the tree-learner split primitive as an exact
  * census argmin).
  */
object Round13Queries5 {

  // ---------------------------------------------------------------- x324

  /** Holm α numerator/denominator (α = 1/20). */
  private val HolmAlphaDen = 20L

  /** x324: Holm–Bonferroni step-down on the x293 exact permutation
    * p-values — the FWER-controlling counterpart of x294's FDR: sort
    * the m p-values, reject the k-th iff EVERY j ≤ k satisfies
    * p_(j) ≤ α/(m−j+1). With exact rationals p = p_num/924 the
    * pointwise test is the integer predicate
    * p_num·(m−k+1)·20 ≤ p_den, and the step-down gate is "k below the
    * first failure" — min() over an exact flag, so the whole procedure
    * is float-free (the x294 contract; the two differ exactly where
    * FWER vs FDR differ, which is the point of pairing them).
    *
    * Scale: m = one p-value per nation; everything after the (already
    * bounded) permutation enumeration is arithmetic on m rows. */
  def holmStepDown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Round12Queries.permPvalues(spark, dir)
    val m = Window.partitionBy(lit(1))
    val ranked = p
      .withColumn("k", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"p_num", $"nationkey")).cast("long"))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("pass",
        $"p_num" * ($"m" - $"k" + 1L) * HolmAlphaDen <= $"p_den")
    val kFail = ranked
      .agg(min(when(!$"pass", $"k")).as("k_fail"), max($"m").as("mm"))
    ranked.crossJoin(broadcast(kFail))
      .select($"nationkey", $"p_num", $"p_den", $"k", $"m",
        $"pass".cast("long").as("pass"),
        when($"k" < coalesce($"k_fail", $"mm" + 1L), 1L).otherwise(0L)
          .as("rejected"))
      .orderBy($"nationkey")
  }

  private val holmOracle =
    s"""WITH ${Round12Queries.permPvaluesCtes},
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM perm_p),
       |rk AS (
       |  SELECT nationkey, p_num, p_den, m,
       |         CAST(row_number() OVER (ORDER BY p_num, nationkey) AS BIGINT) AS k
       |  FROM perm_p, mm),
       |fl AS (SELECT *,
       |         (p_num * (m - k + 1) * $HolmAlphaDen <= p_den) AS pass FROM rk),
       |kf AS (SELECT min(CASE WHEN NOT pass THEN k END) AS k_fail,
       |              max(m) AS mm2 FROM fl)
       |SELECT nationkey, p_num, p_den, k, m,
       |       CAST(CASE WHEN pass THEN 1 ELSE 0 END AS BIGINT) AS pass,
       |       CAST(CASE WHEN k < COALESCE(k_fail, mm2 + 1) THEN 1 ELSE 0 END
       |            AS BIGINT) AS rejected
       |FROM fl, kf
       |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- x325

  /** x325: two-sample ENERGY statistic between en and non-en document
    * lengths — E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|, the
    * distribution-sensitive test that sees SHAPE differences rank tests
    * miss (it is zero iff the distributions are equal). Each pairwise
    * expectation is Σ|v−w|·counts — a PAIR-DEFINED quantity computed
    * WITHOUT a pair join: over the sorted value census,
    * Σ_{w<v} (v−w)·c(w) = v·cnt_before − sum_before, so three
    * cumulative window sums give all three BIGINT-exact pair masses in
    * one pass. The scaled test statistic T = (n_a·n_b/(n_a+n_b))·E is
    * the permutation-testable form.
    *
    * Scale: one census groupBy over the corpus, one O(|distinct
    * lengths|) window pass. Pair masses are bounded by v_max·n²
    * (DECIMAL swap documented for n beyond ~10⁷ at this v_max). */
  def energyDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Round13Queries4.enCharsCensus(spark, dir)
    val w = Window.orderBy($"v").rowsBetween(Long.MinValue, -1)
    val cum = census
      .withColumn("ca", coalesce(sum($"ta").over(w), lit(0L)))
      .withColumn("sa", coalesce(sum($"ta" * $"v").over(w), lit(0L)))
      .withColumn("cb", coalesce(sum($"tb").over(w), lit(0L)))
      .withColumn("sb", coalesce(sum($"tb" * $"v").over(w), lit(0L)))
    val agg = cum.agg(
      sum($"ta").as("na"), sum($"tb").as("nb"),
      // cross pairs |v-w| over BOTH orders of (a,b) membership
      sum($"ta" * ($"v" * $"cb" - $"sb") + $"tb" * ($"v" * $"ca" - $"sa"))
        .as("sxy"),
      // within-group ORDERED pair masses (x2: |v-w| counted both ways)
      (sum($"ta" * ($"v" * $"ca" - $"sa")) * 2L).as("sxx"),
      (sum($"tb" * ($"v" * $"cb" - $"sb")) * 2L).as("syy"))
    def d(c: Column) = c.cast("double")
    agg.select($"na", $"nb", $"sxy", $"sxx", $"syy",
      QueryUtil.halfUp(
        lit(2.0) * d($"sxy") / (d($"na") * d($"nb"))
          - d($"sxx") / (d($"na") * d($"na"))
          - d($"syy") / (d($"nb") * d($"nb")), 6).as("e_stat"),
      QueryUtil.halfUp(
        (d($"na") * d($"nb") / (d($"na") + d($"nb")))
          * (lit(2.0) * d($"sxy") / (d($"na") * d($"nb"))
            - d($"sxx") / (d($"na") * d($"na"))
            - d($"syy") / (d($"nb") * d($"nb"))), 4).as("t_stat"))
  }

  private val energyOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(n_chars AS BIGINT) AS v,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS tb
      |  FROM documents WHERE n_chars > 0 GROUP BY 1),
      |cum AS (
      |  SELECT *,
      |         COALESCE(sum(ta) OVER wb, 0) AS ca,
      |         COALESCE(sum(ta * v) OVER wb, 0) AS sa,
      |         COALESCE(sum(tb) OVER wb, 0) AS cb,
      |         COALESCE(sum(tb * v) OVER wb, 0) AS sb
      |  FROM census
      |  WINDOW wb AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |agg AS (
      |  SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb,
      |         CAST(sum(ta * (v * cb - sb) + tb * (v * ca - sa)) AS BIGINT) AS sxy,
      |         CAST(sum(ta * (v * ca - sa)) * 2 AS BIGINT) AS sxx,
      |         CAST(sum(tb * (v * cb - sb)) * 2 AS BIGINT) AS syy
      |  FROM cum)
      |SELECT na, nb, sxy, sxx, syy,
      |       floor((2.0 * CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |              - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
      |              - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
      |             * 1000000 + 0.5) / 1000000.0 AS e_stat,
      |       floor((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |              / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
      |             * (2.0 * CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |                - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
      |                - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
      |             * 10000 + 0.5) / 10000.0 AS t_stat
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- x326

  /** x326: Gini decision stump — the split primitive every distributed
    * tree learner (GBDT/random forest) evaluates billions of times: the
    * threshold t on n_chars minimizing the weighted Gini impurity of
    * the (lang = en) label, argmin over the value census. The ranking
    * key n_L·Gini_L + n_R·Gini_R expands to
    * n − Σ_side (a_side² + b_side²)/n_side; both engines derive it from
    * the same BIGINT prefix sums with identical double arithmetic, so
    * the argmin (tie-broken by smallest t) is engine-stable unrounded.
    * Emits the chosen threshold, its exact split counts, the impurity
    * drop against the root, and the resulting majority-vote accuracy —
    * all the numbers a stump learner reports.
    *
    * Scale: one census groupBy + one window pass, O(|distinct values|)
    * candidates — the histogram-split strategy XGBoost/LightGBM use at
    * scale, with the census as the (exact) histogram. */
  def giniStump(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Round13Queries4.enCharsCensus(spark, dir)
    val wCum = Window.orderBy($"v").rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy(lit(1))
    val cand = census
      .withColumn("al", sum($"ta").over(wCum))
      .withColumn("bl", sum($"tb").over(wCum))
      .withColumn("na", sum($"ta").over(wAll))
      .withColumn("nb", sum($"tb").over(wAll))
      .filter($"al" + $"bl" < $"na" + $"nb") // right side must be non-empty
    def d(c: Column) = c.cast("double")
    val nl = $"al" + $"bl"
    val nr = $"na" + $"nb" - nl
    val ar = $"na" - $"al"
    val br = $"nb" - $"bl"
    // minimizing weighted Gini == maximizing sum of per-side squared-count
    // ratios (n is constant): key = (al²+bl²)/nl + (ar²+br²)/nr
    val keyed = cand.withColumn("skey",
      (d($"al") * d($"al") + d($"bl") * d($"bl")) / d(nl)
        + (d(ar) * d(ar) + d(br) * d(br)) / d(nr))
    keyed
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"skey".desc, $"v")))
      .filter($"rk" === 1)
      .select($"v".as("threshold"), $"al", $"bl", (ar).as("ar"), (br).as("br"),
        QueryUtil.halfUp(
          // impurity drop: root Gini mass minus split Gini mass, /n
          (($"skey" - (d($"na") * d($"na") + d($"nb") * d($"nb"))
            / d($"na" + $"nb"))) / d($"na" + $"nb"), 6).as("gini_drop"),
        QueryUtil.halfUp(
          (greatest(d($"al"), d($"bl")) + greatest(d(ar), d(br)))
            / d($"na" + $"nb"), 6).as("stump_acc"))
  }

  private val giniStumpOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(n_chars AS BIGINT) AS v,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS tb
      |  FROM documents WHERE n_chars > 0 GROUP BY 1),
      |cand AS (
      |  SELECT v,
      |         sum(ta) OVER wc AS al, sum(tb) OVER wc AS bl,
      |         sum(ta) OVER wa AS na, sum(tb) OVER wa AS nb
      |  FROM census
      |  WINDOW wc AS (ORDER BY v ROWS UNBOUNDED PRECEDING),
      |         wa AS ()),
      |keyed AS (
      |  SELECT *,
      |         (CAST(al AS DOUBLE) * CAST(al AS DOUBLE)
      |          + CAST(bl AS DOUBLE) * CAST(bl AS DOUBLE)) / CAST(al + bl AS DOUBLE)
      |         + (CAST(na - al AS DOUBLE) * CAST(na - al AS DOUBLE)
      |            + CAST(nb - bl AS DOUBLE) * CAST(nb - bl AS DOUBLE))
      |           / CAST(na + nb - al - bl AS DOUBLE) AS skey
      |  FROM cand WHERE al + bl < na + nb),
      |best AS (
      |  SELECT *, row_number() OVER (ORDER BY skey DESC, v) AS rk FROM keyed)
      |SELECT v AS threshold, CAST(al AS BIGINT) AS al, CAST(bl AS BIGINT) AS bl,
      |       CAST(na - al AS BIGINT) AS ar, CAST(nb - bl AS BIGINT) AS br,
      |       floor((skey - (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
      |                     + CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))
      |                    / CAST(na + nb AS DOUBLE)) / CAST(na + nb AS DOUBLE)
      |             * 1000000 + 0.5) / 1000000.0 AS gini_drop,
      |       floor((greatest(CAST(al AS DOUBLE), CAST(bl AS DOUBLE))
      |              + greatest(CAST(na - al AS DOUBLE), CAST(nb - bl AS DOUBLE)))
      |             / CAST(na + nb AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS stump_acc
      |FROM best WHERE rk = 1""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x324_holm_stepdown",
      "Holm-Bonferroni step-down on exact permutation p-values: float-free FWER control paired with x294's BH-FDR",
      holmStepDown, Some(holmOracle)),
    QueryDef("x325_energy_distance",
      "two-sample energy statistic from census prefix sums: pairwise expectations without a pair join, exact BIGINT pair masses",
      energyDistance, Some(energyOracle)),
    QueryDef("x326_gini_stump",
      "Gini decision stump over the value census: histogram-split argmin with unrounded ranking key, exact split counts",
      giniStump, Some(giniStumpOracle)))
}
