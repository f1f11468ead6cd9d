package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 eighteenth tier: probabilistic record linkage (Fellegi–Sunter
  * m/u weight estimation over blocked candidates) and the word2vec
  * negative-sampling table (unigram^(3/4) allocation) built with EXACT
  * integer fourth-root arithmetic. */
object Round10Queries18 {

  /** x173: Fellegi–Sunter record-linkage weights — the probabilistic-ER
    * framework on top of x29's blocking: candidate pairs are the
    * sorted-neighborhood window (per-lang rank distance ≤ 3), "match" is
    * the exact-integer Jaccard ≥ 0.8 gate, and for each comparison field
    * (same source, same length band, same 8-char key prefix) the
    * estimated m = P(agree|match) and u = P(agree|unmatch) yield the
    * log-likelihood-ratio weights w⁺ = ln(m/u), w⁻ = ln((1−m)/(1−u)) a
    * linkage scorer adds per field. Laplace (+1/+2) smoothing keeps every
    * ln finite and deterministic; the lns quantize half-up to 1e-6 (the
    * x20 convention). This is the classical ER method family the
    * threshold-rule dedup tier (x11–x29) doesn't cover: weights LEARNED
    * from the data, not set by hand.
    *
    * Scale: candidates are the x29 equi-join (no cross product); the
    * field rollup is a 3-row aggregate over one pass of the pair set. */
  def linkageWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars",
        array_distinct(split($"text", " ")).as("toks"),
        substring($"text", 1, 12).as("bkey"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"lang").orderBy($"bkey", $"doc_id")))
    val l = keyed.select($"lang", $"rn", $"source".as("src_a"),
        $"n_chars".as("nc_a"), $"toks".as("ta"), $"bkey".as("k_a"))
      .withColumn("rn_r", explode(array($"rn" + 1, $"rn" + 2, $"rn" + 3)))
    val r = keyed.select($"lang", $"rn".as("rn_r"), $"source".as("src_b"),
      $"n_chars".as("nc_b"), $"toks".as("tb"), $"bkey".as("k_b"))
    val pairs = l.join(r, Seq("lang", "rn_r"))
      .select(
        (size(array_intersect($"ta", $"tb")) * 5 >=
          size(array_union($"ta", $"tb")) * 4).cast("long").as("is_match"),
        ($"src_a" === $"src_b").cast("long").as("g_source"),
        (floor($"nc_a" / 100) === floor($"nc_b" / 100)).cast("long").as("g_lenband"),
        (substring($"k_a", 1, 8) === substring($"k_b", 1, 8)).cast("long").as("g_prefix"))
    val folded = pairs.selectExpr(
      "is_match",
      """stack(3,
        |  'g_lenband', g_lenband,
        |  'g_prefix', g_prefix,
        |  'g_source', g_source) as (field, agree)""".stripMargin)
    def lnFp(c: Column): Column =
      floor(log(c) * 1e6 + lit(0.5)).cast("long")
    folded.groupBy($"field")
      .agg(sum($"is_match").as("n_m"),
        sum(lit(1) - $"is_match").as("n_u"),
        sum($"is_match" * $"agree").as("a_m"),
        sum((lit(1) - $"is_match") * $"agree").as("a_u"))
      .select($"field", $"n_m", $"n_u", $"a_m", $"a_u",
        halfUp4(($"a_m" + 1).cast("double") / ($"n_m" + 2).cast("double")).as("m4"),
        halfUp4(($"a_u" + 1).cast("double") / ($"n_u" + 2).cast("double")).as("u4"),
        lnFp((($"a_m" + 1).cast("double") / ($"n_m" + 2).cast("double"))
          / (($"a_u" + 1).cast("double") / ($"n_u" + 2).cast("double"))).as("w_agree_fp"),
        lnFp((($"n_m" + 1 - $"a_m").cast("double") / ($"n_m" + 2).cast("double"))
          / (($"n_u" + 1 - $"a_u").cast("double") / ($"n_u" + 2).cast("double")))
          .as("w_disagree_fp"))
      .orderBy("field")
  }

  private val linkageWeightsOracle =
    """WITH keyed AS MATERIALIZED (
      |  SELECT doc_id, lang, source, n_chars,
      |         list_distinct(string_split(text, ' ')) AS toks,
      |         substr(text, 1, 12) AS bkey,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY substr(text, 1, 12), doc_id) AS rn
      |  FROM documents),
      |p AS MATERIALIZED (
      |  SELECT CAST(len(list_intersect(l.toks, r.toks)) * 5 >=
      |              len(list_distinct(list_concat(l.toks, r.toks))) * 4 AS BIGINT) AS is_match,
      |         CAST(l.source = r.source AS BIGINT) AS g_source,
      |         CAST(floor(l.n_chars / 100) = floor(r.n_chars / 100) AS BIGINT) AS g_lenband,
      |         CAST(substr(l.bkey, 1, 8) = substr(r.bkey, 1, 8) AS BIGINT) AS g_prefix
      |  FROM keyed l JOIN keyed r
      |    ON l.lang = r.lang AND r.rn > l.rn AND r.rn <= l.rn + 3),
      |f AS (SELECT is_match, t.field, t.agree
      |      FROM p, LATERAL (VALUES
      |        ('g_lenband', p.g_lenband),
      |        ('g_prefix', p.g_prefix),
      |        ('g_source', p.g_source)) AS t(field, agree)),
      |agg AS (
      |  SELECT field,
      |         CAST(sum(is_match) AS BIGINT) AS n_m,
      |         CAST(sum(1 - is_match) AS BIGINT) AS n_u,
      |         CAST(sum(is_match * agree) AS BIGINT) AS a_m,
      |         CAST(sum((1 - is_match) * agree) AS BIGINT) AS a_u
      |  FROM f GROUP BY field)
      |SELECT field, n_m, n_u, a_m, a_u,
      |       floor((CAST(a_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS m4,
      |       floor((CAST(a_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS u4,
      |       CAST(floor(ln((CAST(a_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE))
      |                     / (CAST(a_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE))) * 1000000 + 0.5)
      |            AS BIGINT) AS w_agree_fp,
      |       CAST(floor(ln((CAST(n_m + 1 - a_m AS DOUBLE) / CAST(n_m + 2 AS DOUBLE))
      |                     / (CAST(n_u + 1 - a_u AS DOUBLE) / CAST(n_u + 2 AS DOUBLE))) * 1000000 + 0.5)
      |            AS BIGINT) AS w_disagree_fp
      |FROM agg
      |ORDER BY field""".stripMargin

  /** x174 negative-sample budget. */
  private val NegBudget = 100000L

  /** Exact integer floor-sqrt: IEEE sqrt then a ±1 boundary correction,
    * so the result is floor(√x) for every BIGINT x ≤ 2^52 regardless of
    * double rounding at perfect-square boundaries. */
  private[queries] def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > x, s0 - 1).otherwise(s0)
    when((s1 + 1) * (s1 + 1) <= x, s1 + 1).otherwise(s1)
  }
  private[queries] def isqrtSql(x: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT)"
    val s1 = s"(CASE WHEN $s0 * $s0 > ($x) THEN $s0 - 1 ELSE $s0 END)"
    s"(CASE WHEN ($s1 + 1) * ($s1 + 1) <= ($x) THEN $s1 + 1 ELSE $s1 END)"
  }

  /** x174: word2vec negative-sampling table — token sampling mass
    * ∝ count^(3/4) (Mikolov's smoothing; it up-weights the tail so rare
    * words get negative examples), realized as an EXACT-integer
    * allocation: weight = ⌊c^(3/4)⌋ = isqrt(isqrt(c³)) — two IEEE
    * square roots with ±1 boundary corrections, NO libm pow/ln/exp in
    * the weight at all — then the x155 largest-remainder apportionment
    * of a 100k-sample budget (Σ alloc = budget exactly). Top-30 rows by
    * allocation; the share columns show the flattening (the heaviest
    * token's allocation share is visibly below its raw frequency share).
    *
    * Scale: vocab-bounded aggregate + O(vocab) arithmetic; the table
    * broadcasts to the skip-gram sampler (x20's pair generator). */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .select($"tok", $"c", isqrt(isqrt($"c" * $"c" * $"c")).as("q"))
    val tot = c.agg(sum($"q").as("qq"), sum($"c").as("cc"))
    val q = c.crossJoin(broadcast(tot))
      .select($"tok", $"c", $"q", $"qq", $"cc",
        expr(s"($NegBudget * q) DIV qq").as("floor_alloc"),
        ((lit(NegBudget) * $"q") % $"qq").as("rem"))
    val short = q.agg((lit(NegBudget) - sum($"floor_alloc")).as("k"))
    val w = Window.orderBy($"rem".desc, $"tok")
    q.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(w))
      .select($"tok", $"c", $"q",
        ($"floor_alloc" + ($"rk" <= $"k").cast("long")).as("alloc"),
        halfUp4($"c".cast("double") / $"cc".cast("double")).as("freq_share"),
        halfUp4(($"floor_alloc" + ($"rk" <= $"k").cast("long")).cast("double")
          / lit(NegBudget.toDouble)).as("alloc_share"))
      .orderBy($"alloc".desc, $"tok")
      .limit(30)
  }

  private val negativeSamplingOracle = {
    val q34 = isqrtSql(isqrtSql("c * c * c"))
    s"""WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
       |           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |           GROUP BY tok),
       |cq AS (SELECT tok, c, $q34 AS q FROM c),
       |tot AS (SELECT CAST(sum(q) AS BIGINT) AS qq, CAST(sum(c) AS BIGINT) AS cc FROM cq),
       |a AS (SELECT tok, c, q, qq, cc,
       |        ($NegBudget * q) // qq AS floor_alloc,
       |        ($NegBudget * q) % qq AS rem
       |      FROM cq CROSS JOIN tot),
       |s AS (SELECT CAST($NegBudget - sum(floor_alloc) AS BIGINT) AS k FROM a),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, tok) AS rk
       |      FROM a CROSS JOIN s)
       |SELECT tok, c, q,
       |       CAST(floor_alloc + CAST(rk <= k AS BIGINT) AS BIGINT) AS alloc,
       |       floor(CAST(c AS DOUBLE) / CAST(cc AS DOUBLE) * 10000 + 0.5) / 10000.0 AS freq_share,
       |       floor(CAST(floor_alloc + CAST(rk <= k AS BIGINT) AS DOUBLE) / ${NegBudget}.0
       |             * 10000 + 0.5) / 10000.0 AS alloc_share
       |FROM r
       |ORDER BY alloc DESC, tok
       |LIMIT 30""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x173_linkage_weights",
      "Fellegi-Sunter m/u estimation over blocked candidates: per-field LLR weights learned from the exact-Jaccard labels",
      linkageWeights, Some(linkageWeightsOracle)),
    QueryDef("x174_negative_sampling",
      "word2vec unigram^(3/4) negative-sampling table via exact integer fourth roots + largest-remainder budget allocation",
      negativeSampling, Some(negativeSamplingOracle)))
}
