package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 twenty-fifth tier: distributed model-training parity and
  * randomized-estimator audits. Three genuinely new shapes for the
  * engine: full-batch gradient training where the DISTRIBUTED update
  * arithmetic must equal a sequential oracle bit-for-bit (x181), a
  * Poisson-bootstrap confidence interval built from deterministic
  * hash-quantized resampling weights (x182), and an AMS second-moment
  * sketch audited against the exact F2 (x183). All arithmetic is
  * integer / fixed-point so DuckDB re-derives every intermediate. */
object Round10Queries25 {

  // ---------------------------------------------------------------- x181

  private val PIters = 6

  /** x181: distributed full-batch perceptron training with a geometric
    * step schedule — the "train a quality classifier over the corpus"
    * family member where the DISTRIBUTED update arithmetic is proven
    * equal to a sequential oracle. Each iteration is one scan: rows
    * misclassified under the current weights (margin y·(w·x) ≤ 0)
    * contribute y·x to a summed subgradient g; the weight step is the
    * AVERAGED subgradient in 1/256 margin units with a halving learning
    * rate, upd = trunc(256·g / (n_mis·2^it)) — all integer, so map-side
    * partial aggregation reconstructs the sequential batch update
    * EXACTLY (integer addition is associative; unlike float GD there is
    * no reduction-order drift to hide). Constant-step batch perceptron
    * OSCILLATES on this data (measured: it bounces between the two
    * all-one-class corners); the 2^-it decay is what makes the
    * trajectory reach ZERO training errors by iteration 6 at all three
    * SFs (measured). Label: n_chars ≥ 300; feature: n_chars div 100 —
    * separable by construction, so 0 errors is the correct fixed point.
    * Division is truncation toward zero on BOTH sides (Scala `/` here,
    * sign-split floor-div in the oracle — DuckDB `//` floors, which
    * differs on negative numerators).
    *
    * Output: one row per iteration — misclassified count under the
    * entering weights, weights after the update.
    *
    * Scale: the classic distributed-GD loop — per iteration ONE full
    * scan with a 3-long partial aggregate; only the scalar weight
    * vector moves through the driver (broadcast back as literals). At
    * 100 TB: iterations cost linear scans; no shuffle wider than the
    * partial-sum tree. */
  /** One distributed subgradient step: misclassified count and summed
    * (y, y·c) over rows with margin y·(wb + wc·c) ≤ 0. The unit the
    * PropertySpec pins against a sequential fold on arbitrary data. */
  private[graft] def perceptronStep(feats: DataFrame, wb: Long, wc: Long):
      (Long, Long, Long) = {
    import feats.sparkSession.implicits._
    val g = feats.filter($"y" * (lit(wb) + lit(wc) * $"c") <= 0)
      .agg(count(lit(1)).as("mis"), sum($"y").as("gb"), sum($"y" * $"c").as("gc"))
      .select(coalesce($"mis", lit(0L)), coalesce($"gb", lit(0L)),
        coalesce($"gc", lit(0L)))
      .head()
    (g.getLong(0), g.getLong(1), g.getLong(2))
  }

  def perceptronTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = Tables.documents(spark, dir).select(
      expr("CAST(n_chars AS BIGINT) div 100").as("c"),
      when($"n_chars" >= 300, 1L).otherwise(-1L).as("y"))
      .localCheckpoint(true)
    var wb = 0L; var wc = 0L
    val rows = (1 to PIters).map { it =>
      val (mis, gb, gc) = perceptronStep(feats, wb, wc)
      if (mis > 0) {
        val d = mis * (1L << it)
        wb += 256L * gb / d // Scala / truncates toward zero
        wc += 256L * gc / d
      }
      (it, mis, wb, wc)
    }
    spark.createDataFrame(rows)
      .toDF("it", "n_mis", "w_bias", "w_chars")
      .orderBy("it")
  }

  /** Oracle for [[perceptronTrain]]: the same PIters iterations unrolled
    * as CTE pairs (g_t = summed subgradient + misclassified count under
    * w_{t-1}; w_t = decayed averaged step). `tdiv` emulates Scala's
    * truncation toward zero via a sign split over DuckDB's flooring //. */
  private val perceptronOracle: String = {
    def tdiv(num: String, den: String) =
      s"CASE WHEN $num >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"
    def gCte(t: Int, wb: String, wc: String) =
      s"""g$t AS (SELECT CAST(count(*) AS BIGINT) AS mis,
         |            CAST(COALESCE(sum(y), 0) AS BIGINT) AS gb,
         |            CAST(COALESCE(sum(y * c), 0) AS BIGINT) AS gc
         |     FROM feats WHERE y * ($wb + ($wc) * c) <= 0)""".stripMargin
    def wCte(t: Int, prev: String) = {
      val d = s"CASE WHEN g$t.mis = 0 THEN 1 ELSE g$t.mis * ${1L << t} END"
      s"""w$t AS (SELECT $prev.wb + ${tdiv(s"256 * g$t.gb", d)} AS wb,
         |            $prev.wc + ${tdiv(s"256 * g$t.gc", d)} AS wc
         |     FROM $prev, g$t)""".stripMargin
    }
    val ctes = new StringBuilder(
      """WITH feats AS (
        |  SELECT CAST(n_chars AS BIGINT) // 100 AS c,
        |         CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y
        |  FROM documents),
        |w0 AS (SELECT CAST(0 AS BIGINT) AS wb, CAST(0 AS BIGINT) AS wc)""".stripMargin)
    (1 to PIters).foreach { t =>
      ctes.append(",\n").append(gCte(t, s"w${t - 1}.wb", s"w${t - 1}.wc")
        .replace("FROM feats WHERE", s"FROM feats, w${t - 1} WHERE"))
      ctes.append(",\n").append(wCte(t, s"w${t - 1}"))
    }
    val sel = (1 to PIters).map { t =>
      s"SELECT $t AS it, (SELECT mis FROM g$t) AS n_mis, wb AS w_bias, wc AS w_chars FROM w$t"
    }.mkString("\nUNION ALL\n")
    ctes.append("\n").append(sel).append("\nORDER BY it").toString
  }

  // ---------------------------------------------------------------- x182

  /** Quantized-Poisson(1) resampling weight from a uniform integer in
    * [0, 1e6): inverse-CDF cutoffs at the 1e-6-quantized Poisson(1)
    * CDF (0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406,
    * cap at 6). Shared by the Spark side and the oracle verbatim. */
  private def poissonW(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(u < 367879L, 0L).when(u < 735759L, 1L).when(u < 919699L, 2L)
      .when(u < 981012L, 3L).when(u < 996340L, 4L).when(u < 999406L, 5L)
      .otherwise(6L)

  /** x182: Poisson-bootstrap confidence interval for the mean order
    * value. The classical bootstrap's multinomial resample needs global
    * coordination; the Poisson bootstrap (Chamandy et al.'s production
    * variant) replaces it with an independent per-row weight w ~
    * Poisson(1) per replicate — embarrassingly parallel, ONE pass over
    * the data for all B replicates. Here the weights are DETERMINISTIC:
    * u = hash(o_orderkey, b) via two multiplicative mixes kept under
    * 2^62 (ANSI-safe in both engines), pushed through the quantized
    * Poisson(1) inverse CDF. Replicate means are exact integer
    * fixed-point (cents·1e4 floor-div count); the CI is the 2nd/31st
    * order statistic of the 32 replicate means (~94% nominal).
    *
    * Scale: one scan expanded B× (B=32 is the multiplier to size), all
    * replicates aggregated map-side in the same pass, 32-row final
    * reduction. No per-replicate job, no driver resample table. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Tables.orders(spark, dir)
      .select($"o_orderkey".cast("long").as("k"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("v"))
    val reps = spark.range(32).select($"id".as("b"))
    val means = v.crossJoin(broadcast(reps))
      .select($"b", $"v",
        poissonW(pmod(pmod($"k" * 1000003L + $"b", lit(1048573L)) * 2654435761L, lit(1000000L))).as("w"))
      .groupBy($"b")
      .agg(sum($"w" * $"v").as("swv"), sum($"w").as("sw"))
      .select($"b", expr("(swv * 10000) div sw").as("m"))
    val full = v.agg(expr("(sum(v) * 10000) div count(*)").as("est"),
      count(lit(1)).as("n_orders"))
    means.agg(
      element_at(sort_array(collect_list($"m")), 2).as("boot_lo_fp"),
      element_at(sort_array(collect_list($"m")), 31).as("boot_hi_fp"),
      count(lit(1)).as("n_reps"))
      .crossJoin(full)
      .select($"n_orders", $"est".as("est_mean_fp"), $"boot_lo_fp", $"boot_hi_fp",
        $"n_reps",
        ($"est" >= $"boot_lo_fp" && $"est" <= $"boot_hi_fp").cast("int").as("covered"))
  }

  private val bootstrapOracle =
    """WITH v AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
      |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      |           FROM orders),
      |reps AS (SELECT unnest(range(32)) AS b),
      |wts AS (SELECT b, v,
      |          CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
      |               WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
      |               WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
      |               ELSE 6 END AS w
      |        FROM (SELECT b, v,
      |                ((k * 1000003 + b) % 1048573) * 2654435761 % 1000000 AS u
      |              FROM v, reps) t0),
      |means AS (SELECT b, CAST(sum(w * v) * 10000 // sum(w) AS BIGINT) AS m
      |          FROM wts GROUP BY b),
      |full0 AS (SELECT CAST(sum(v) * 10000 // count(*) AS BIGINT) AS est,
      |                 CAST(count(*) AS BIGINT) AS n_orders FROM v),
      |ci AS (SELECT (SELECT m FROM means ORDER BY m LIMIT 1 OFFSET 1) AS boot_lo_fp,
      |              (SELECT m FROM means ORDER BY m DESC LIMIT 1 OFFSET 1) AS boot_hi_fp,
      |              CAST(count(*) AS BIGINT) AS n_reps FROM means)
      |SELECT n_orders, est AS est_mean_fp, boot_lo_fp, boot_hi_fp, n_reps,
      |       CAST(est >= boot_lo_fp AND est <= boot_hi_fp AS INTEGER) AS covered
      |FROM ci, full0""".stripMargin

  // ---------------------------------------------------------------- x183

  /** x183: AMS (Alon–Matias–Szegedy) second-frequency-moment sketch,
    * audited against the exact F2 = Σ_k count(k)². Sixteen independent
    * estimators; estimator i assigns each key a deterministic ±1 sign
    * (hash parity) and keeps the running signed row count Z_i — then
    * E[Z_i²] = F2. The estimate is the mean of the 16 squares; the
    * audit emits exact, estimate, and a generous 3× two-sided bound
    * flag (theoretical rel. std. is √(2/16) ≈ 0.35). Key: l_partkey.
    *
    * Scale: the sketch is a 16-long integer vector with map-side
    * partial sums — mergeable across partitions and across days, which
    * is the point vs computing exact F2 (a full groupBy on the key).
    * The exact side here exists only as the audit's ground truth. */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_partkey".cast("long").as("k"))
    // Sign hash MUST be nonlinear: a pure multiplicative-congruential map
    // (first attempt) leaves adjacent keys with near-alternating signs —
    // antithetic structure that CANCELS the signed sums and biased the
    // estimate ~40x LOW at every SF (measured). Two xor-shift rounds
    // between the multiplies break the linearity; all intermediates stay
    // under 2^62 so ANSI-mode arithmetic is overflow-safe in both engines.
    val h1 = pmod(pmod($"k" * 7919L + $"i" * 104729L, lit(1048576L)) * 2654435761L,
      lit(2147483648L))
    val h3 = pmod(h1.bitwiseXOR(shiftright(h1, 13)) * 2246822519L, lit(2147483648L))
    val sgn = when(pmod(h3.bitwiseXOR(shiftright(h3, 16)), lit(2L)) === 0L, 1L)
      .otherwise(-1L)
    val est = li.crossJoin(broadcast(spark.range(16).select($"id".as("i"))))
      .select($"i", sgn.as("sgn"))
      .groupBy($"i").agg(sum($"sgn").as("z"))
      .agg(expr("(sum(z * z)) div count(*)").as("f2_est"))
    val exact = li.groupBy($"k").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c").as("f2_exact"))
    est.crossJoin(exact).select(
      $"f2_exact", $"f2_est",
      ($"f2_est" >= expr("f2_exact div 3") && $"f2_est" <= $"f2_exact" * 3)
        .cast("int").as("within_3x"))
  }

  private val amsOracle =
    """WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem),
      |ests AS (SELECT i, CAST(sum(sgn) AS BIGINT) AS z FROM (
      |    SELECT i, CASE WHEN xor(h3, h3 >> 16) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      |    FROM (
      |      SELECT i, (xor(h1, h1 >> 13) * 2246822519) % 2147483648 AS h3
      |      FROM (
      |        SELECT i, ((k * 7919 + i * 104729) % 1048576 * 2654435761)
      |                    % 2147483648 AS h1
      |        FROM li, (SELECT unnest(range(16)) AS i) ix) ha) hb) t0 GROUP BY i),
      |est AS (SELECT CAST(sum(z * z) // count(*) AS BIGINT) AS f2_est FROM ests),
      |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM
      |         (SELECT count(*) AS c FROM li GROUP BY k) cs)
      |SELECT f2_exact, f2_est,
      |       CAST(f2_est >= f2_exact // 3 AND f2_est <= f2_exact * 3 AS INTEGER)
      |         AS within_3x
      |FROM est, ex""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x181_perceptron_train",
      "distributed full-batch perceptron, 6 decayed-step iterations to zero training error, integer updates equal to the sequential oracle",
      perceptronTrain, Some(perceptronOracle)),
    QueryDef("x182_bootstrap_ci",
      "Poisson-bootstrap CI for the mean order value: 32 deterministic hash-weighted replicates in one pass",
      bootstrapCi, Some(bootstrapOracle)),
    QueryDef("x183_ams_f2",
      "AMS second-moment sketch (16 signed estimators) audited against exact F2 on l_partkey",
      amsF2, Some(amsOracle)))
}
