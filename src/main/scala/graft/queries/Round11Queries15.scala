package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 fifteenth tier: phonetic blocking through Spark's BUILTIN
  * soundex pinned against a from-the-spec SQL reimplementation (the
  * entity-resolution blocking key next to x173's Fellegi–Sunter
  * weights), and a distribution-free median confidence interval by the
  * order-statistic method (exact rank selection — no bootstrap, no
  * resampling) over the value census.
  */
object Round11Queries15 {

  // ---------------------------------------------------------------- x279

  /** x279: soundex phonetic blocking — block part-name color words by
    * Spark's builtin `soundex` and report block sizes (the classic
    * cheap blocking key for entity resolution: candidate pairs come
    * from same-block joins, Σ|block|² not |corpus|²). The oracle
    * reimplements the algorithm Spark actually ships (the H/W-SKIPPING
    * variant: H and W are ignored WITHOUT resetting the previous code,
    * so equal codes collapse ACROSS them — `ashcraft`→A261 not A226,
    * `sikhs`→S200 not S220, `burroughs`→B620 not B622; vowels still
    * break runs) from first principles in SQL: translate through the
    * code table with H/W mapped to a sentinel 7, DELETE the sentinels
    * from position 2 on (the head keeps its slot so the first letter's
    * code still anchors the run-collapse even when the word STARTS
    * with h/w), collapse adjacent equal codes, drop the leading code,
    * strip zeros, pad to 3 digits. The divergent class (consonant +
    * h/w + same-code consonant) is pinned by a unit fixture in
    * Round12Spec. RE2 has no pattern backreferences, so the
    * adjacent-duplicate collapse runs one regexp per code digit.
    *
    * Scale: one distinct + one group-by on a bounded vocabulary; as a
    * blocking stage the key assignment is a narrow map over the
    * corpus. */
  def soundexBlocking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.part(spark, dir)
      .select(explode(split($"p_name", " ")).as("w"))
      .unionByName(Tables.documents(spark, dir)
        .select(explode(split($"text", " ")).as("w")))
      .filter($"w".rlike("^[a-z]+$"))
      .distinct()
    words.select($"w", soundex($"w").as("sdx"))
      .groupBy($"sdx")
      .agg(count(lit(1)).as("n_words"), min($"w").as("first_word"),
        max($"w").as("last_word"))
      .orderBy($"sdx")
  }

  private val soundexBlockingOracle = {
    // the classic letter->code table, A..Z, with H and W mapped to the
    // sentinel 7 (Spark's own mapping): 7 means "silent — skip without
    // resetting the run", unlike vowels' 0 which breaks runs
    val table = "01230127022455012623017202"
    val codes = s"translate(up, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '$table')"
    // delete the H/W sentinels AFTER the head slot so adjacent-equal codes
    // collapse across them; the head keeps its slot (and its own code) so
    // h/w-initial words still anchor the collapse with code 7, which never
    // equals a real code — e.g. `hb` stays H100, not H000
    val joined = s"substr($codes, 1, 1) || replace(substr($codes, 2), '7', '')"
    // collapse adjacent equal codes: one regexp per digit (RE2: no backrefs)
    val collapsed = (0 to 6).foldLeft(joined) { (acc, d) =>
      s"regexp_replace($acc, '$d{2,}', '$d', 'g')" }
    s"""WITH words AS MATERIALIZED (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part
       |    UNION ALL
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$')),
       |sdx AS (
       |  SELECT w,
       |         substr(up, 1, 1) ||
       |         substr(replace(substr($collapsed, 2), '0', '') || '000', 1, 3)
       |           AS sdx
       |  FROM (SELECT w, upper(w) AS up FROM words))
       |SELECT sdx, CAST(count(*) AS BIGINT) AS n_words,
       |       min(w) AS first_word, max(w) AS last_word
       |FROM sdx
       |GROUP BY sdx
       |ORDER BY sdx""".stripMargin
  }

  // ---------------------------------------------------------------- x280

  /** x280: distribution-free median confidence interval — the
    * order-statistic method: the 95% CI for the population median is
    * [X_(lo), X_(hi)] with `lo = floor((n − 1.96√n)/2)` and
    * `hi = ceil(1 + (n + 1.96√n)/2)` (normal approximation to the
    * binomial(n, ½) rank distribution). No resampling: the ranks are
    * integers from one deterministic formula (floor/ceil of identical
    * doubles), and the order statistics are read from the VALUE CENSUS
    * by cumulative counts — never a row-level global sort (the x270
    * recipe).
    *
    * Scale: one group-by-value census + a |values|-row running sum; at
    * 100 TB this is how you attach honest uncertainty to a median
    * without a terabyte sort or bootstrap replicas. */
  def medianCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select(floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("v"))
      .groupBy($"v").agg(count(lit(1)).as("t"))
      .localCheckpoint(true)
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
    val cum = census
      .withColumn("cum", sum($"t").over(w))
      .withColumn("before", $"cum" - $"t")
    val ranks = census.agg(sum($"t").as("n"))
      .select($"n",
        greatest(lit(1L),
          floor(($"n".cast("double") - lit(1.96) * sqrt($"n".cast("double"))) / 2.0)
            .cast("long")).as("lo_rank"),
        expr("(n + 1) DIV 2").as("med_rank"),
        least($"n",
          ceil(lit(1.0) + ($"n".cast("double") + lit(1.96) * sqrt($"n".cast("double"))) / 2.0)
            .cast("long")).as("hi_rank"))
    val picks = ranks.select($"n", explode(array(
        struct(lit("lo").as("which"), $"lo_rank".as("k")),
        struct(lit("med").as("which"), $"med_rank".as("k")),
        struct(lit("hi").as("which"), $"hi_rank".as("k")))).as("p"))
      .select($"n", $"p.which".as("which"), $"p.k".as("k"))
    cum.join(broadcast(picks), $"before" < $"k" && $"cum" >= $"k")
      .select($"which", $"n", $"k", $"v".as("value_cents"),
        ($"v" / 100.0).as("value"))
      .orderBy($"which")
  }

  private val medianCiOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS t
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT v, t,
      |         CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |           AS BIGINT) AS cum
      |  FROM census),
      |nn AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM census),
      |ranks AS (
      |  SELECT n, which, k FROM nn, LATERAL (
      |    SELECT * FROM (VALUES
      |      ('lo', greatest(1, CAST(floor((CAST(n AS DOUBLE)
      |              - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT))),
      |      ('med', (n + 1) // 2),
      |      ('hi', least(n, CAST(ceil(1.0 + (CAST(n AS DOUBLE)
      |              + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)))
      |    ) t(which, k)))
      |SELECT r.which, r.n, r.k, c.v AS value_cents, c.v / 100.0 AS value
      |FROM ranks r JOIN cum c ON c.cum - c.t < r.k AND c.cum >= r.k
      |ORDER BY r.which""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x279_soundex_blocking",
      "phonetic blocking: builtin soundex pinned against a from-the-spec SQL oracle",
      soundexBlocking, Some(soundexBlockingOracle)),
    QueryDef("x280_median_ci",
      "distribution-free median CI by order statistics over the value census",
      medianCi, Some(medianCiOracle)))
}
