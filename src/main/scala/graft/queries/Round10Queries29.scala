package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 twenty-ninth tier: LSH S-curve calibration — the measured
  * candidate-probability curve of the production banding scheme against
  * its closed-form theory, the chart a dedup service owner uses to pick
  * (bands, rows) for a target Jaccard threshold. */
object Round10Queries29 {

  private val SCurveBins = 10
  /** Theoretical candidate probability of the production banding
    * (b = 4 bands of r = 3 rows): P(s) = 1 − (1 − s³)⁴, evaluated at
    * each bin midpoint, half-up 1e-6 fixed point. Shared verbatim with
    * the oracle (the Scala constants ARE the oracle literals). */
  private val TheoFp: Seq[Long] = (0 until SCurveBins).map { b =>
    val s = (b + 0.5) / SCurveBins
    math.floor((1.0 - math.pow(1.0 - s * s * s, 4.0)) * 1e6 + 0.5).toLong
  }

  /** x191: LSH S-curve calibration audit. Natural corpus pairs are
    * useless for this curve — a measured 10% sample has ALL its pairs
    * at Jaccard ≈ 0 plus a handful of exact dups, nothing in the steep
    * region. So the probe pairs are CONSTRUCTED: for each sampled
    * document (doc_id % 10 = 0) with sorted shingle set A (|A| = m) and
    * each target decile k = 1..9, a variant B keeps the first
    * p = ⌊2mk/(10+k)⌋ shingles of A and pads with m−p fresh tokens
    * (':'-bearing strings that cannot equal any 3-token shingle), so
    * Jaccard(A, B) = p/(2m−p) ≈ k/10 EXACTLY by construction — no
    * merge-walk needed, the overlap is arithmetic. Both sets run
    * through the PRODUCTION hash family (12 md5 MinHashes → 4 bands ×
    * 3 rows, the x11 pipeline's exact banding) and a pair is a
    * candidate when any band position agrees. Per decile bin: measured
    * candidate rate, mean exact Jaccard, and the closed-form
    * 1 − (1 − s³)⁴ at the bin midpoint. The steep region (s ≈ 0.5–0.7)
    * is what justifies x11's 0.5 verification threshold; x26 audits one
    * operating point, this traces the whole curve.
    *
    * Scale: probe cost is 9 variants × sample size, independent of the
    * corpus pair count — the estimator a 100 TB deployment runs on a
    * fixed sampled cohort; the banding under test is byte-identical to
    * the production path. */
  def lshScurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sub = Tables.documents(spark, dir)
      .filter(pmod($"doc_id", lit(10L)) === 0L)
      .select($"doc_id", DedupQueries.tokenShingles($"text").as("a"))
      .select($"doc_id", $"a", size($"a").cast("long").as("m"))
    val probes = sub
      .select($"doc_id", $"a", $"m", explode(sequence(lit(1), lit(9))).as("k"))
      .select($"doc_id", $"a", $"m", $"k",
        expr("(2 * m * k) div (10 + k)").as("p"))
      .select($"doc_id", $"k", $"p", ($"m" * 2 - $"p").as("u"),
        call_function("minhash_bands", $"a", lit(12), lit(3)).as("ba"),
        call_function("minhash_bands",
          concat(slice($"a", lit(1), $"p".cast("int")),
            transform(sequence(lit(1L), $"m" - $"p"),
              i => concat_ws(":", lit("fresh"), $"doc_id", $"k", i))),
          lit(12), lit(3)).as("bb"))
    val binned = probes.select(
      least(expr("(p * 10) div u"), lit(SCurveBins - 1L)).as("bin"),
      expr("(p * 1000000) div u").as("j_fp"),
      array_contains(zip_with($"ba", $"bb", (x, y) => x === y), true)
        .cast("long").as("cand"))
    val theo = TheoFp.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("bin", "theo_fp")
    binned.groupBy($"bin")
      .agg(count(lit(1)).as("n_pairs"), sum($"cand").as("n_cand"),
        expr("sum(j_fp) div count(*)").as("mean_j_fp"))
      .join(broadcast(theo), "bin")
      .select($"bin", $"n_pairs", $"n_cand", $"mean_j_fp",
        expr("(n_cand * 1000000) div n_pairs").as("cand_rate_fp"), $"theo_fp")
      .select($"bin", $"n_pairs", $"n_cand", $"mean_j_fp", $"cand_rate_fp",
        $"theo_fp", abs($"cand_rate_fp" - $"theo_fp").as("abs_dev_fp"))
      .orderBy($"bin")
  }

  private lazy val scurveOracle = {
    val mh = (0 until 12).map(j =>
      s"list_aggregate(list_transform(sh, s -> md5('$j:' || s)), 'min') AS mh$j")
      .mkString(",\n       ")
    val bands = (0 until 4).map(b =>
      s"md5(concat_ws('|', mh${3 * b}, mh${3 * b + 1}, mh${3 * b + 2})) AS b$b")
      .mkString(", ")
    val candSql = (0 until 4).map(b => s"x.b$b = y.b$b").mkString(" OR ")
    val theoValues = TheoFp.zipWithIndex
      .map { case (p, i) => s"($i, $p)" }.mkString(", ")
    s"""WITH sub AS (
       |  SELECT doc_id, a, CAST(len(a) AS BIGINT) AS m FROM (
       |    SELECT doc_id, list_sort(${DedupQueries.shinglesSql}) AS a
       |    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
       |          FROM documents WHERE doc_id % 10 = 0) t0) t1),
       |probes AS (
       |  SELECT doc_id, k, p, 2 * m - p AS u, a AS sha,
       |         list_concat(a[1:CAST(p AS INTEGER)],
       |           list_transform(range(1, CAST(m - p AS INTEGER) + 1),
       |             i -> concat_ws(':', 'fresh', CAST(doc_id AS VARCHAR),
       |                            CAST(k AS VARCHAR), CAST(i AS VARCHAR)))) AS shb
       |  FROM (SELECT doc_id, a, m, k, (2 * m * k) // (10 + k) AS p
       |        FROM sub, (SELECT unnest(range(1, 10)) AS k) ks) t2),
       |siga AS (SELECT doc_id, k, p, u, $mh
       |         FROM (SELECT doc_id, k, p, u, sha AS sh FROM probes) ta),
       |banda AS (SELECT doc_id, k, p, u, $bands FROM siga),
       |sigb AS (SELECT doc_id, k, $mh
       |         FROM (SELECT doc_id, k, shb AS sh FROM probes) tb),
       |bandb AS (SELECT doc_id, k, $bands FROM sigb),
       |pairs AS (SELECT x.p, x.u, CASE WHEN $candSql THEN 1 ELSE 0 END AS cand
       |          FROM banda x JOIN bandb y ON x.doc_id = y.doc_id AND x.k = y.k),
       |binned AS (SELECT least((p * 10) // u, ${SCurveBins - 1}) AS bin,
       |                  (p * 1000000) // u AS j_fp, cand
       |           FROM pairs),
       |theo(bin, theo_fp) AS (VALUES $theoValues),
       |agg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
       |               CAST(sum(cand) AS BIGINT) AS n_cand,
       |               CAST(sum(j_fp) // count(*) AS BIGINT) AS mean_j_fp
       |        FROM binned GROUP BY bin)
       |SELECT a.bin, n_pairs, n_cand, mean_j_fp,
       |       CAST((n_cand * 1000000) // n_pairs AS BIGINT) AS cand_rate_fp,
       |       CAST(theo_fp AS BIGINT) AS theo_fp,
       |       CAST(abs((n_cand * 1000000) // n_pairs - theo_fp) AS BIGINT) AS abs_dev_fp
       |FROM agg a JOIN theo ON theo.bin = a.bin
       |ORDER BY a.bin""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x191_lsh_scurve",
      "LSH S-curve calibration: constructed-overlap probes per Jaccard decile vs 1-(1-s^3)^4 theory",
      lshScurve, Some(scurveOracle)))
}
