package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-11 sixth tier: three published corpus-logistics operators that
  * complete existing families — UniMax budget water-filling (next to
  * x251's DoReMi reweighting and x85's temperature mixture), simple
  * Good-Turing frequency smoothing (next to x149 Kneser-Ney and x245
  * Stupid Backoff), and D4-style cluster prototype pruning (next to
  * x15's SemDeDup pass). All keep the corpus-sized work to one
  * aggregation / one broadcast assignment; the decision math runs on
  * domain-cardinality frames. */
object Round11Queries6 {

  /** UniMax epoch cap (max passes over any one source's data). */
  private val UniEpochCap = 3L

  /** Prototype-prune drop fraction denominator (drop n/5 = top 20%). */
  private val ProtoDropDen = 5L

  // ---------------------------------------------------------------- x253

  /** x253: UniMax budget allocation (Chung et al. 2023) — water-filling
    * a total token budget B (= half the corpus here) across sources
    * under a per-source epoch cap: sources whose cap `N * c_s` fits
    * under the current uniform share get exactly their cap; the rest
    * split the remaining budget evenly. Uses the closed form of the
    * sequential greedy: with caps sorted ascending, source at rank i is
    * capped iff `cap_i * slots_remaining <= budget_remaining_before_i`
    * (all BIGINT cross-multiplied — no division until the final even
    * split, which is exact integer `floor(R / m)` with the sub-m
    * remainder documented as unallocated). Identical predicate and
    * prefix sums in the oracle, so the pairing is engine-exact.
    *
    * Scale: the corpus-sized pass is ONE per-source aggregation
    * (map-side partial sums); everything after runs on a |sources|-row
    * frame, so the unpartitioned windows are |sources|-sized by
    * construction — the same shape a 100 TB mixture budget fit has. */
  def unimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .groupBy($"source").agg(sum($"n_chars").as("c"))
      .localCheckpoint(true)
    val tot = src.agg(sum($"c").as("tot_c"), count(lit(1)).as("n_src"))
    val w = Window.orderBy($"c", $"source")
    val ranked = src.crossJoin(broadcast(tot))
      .withColumn("budget", ($"tot_c" / 2L).cast("long"))
      .withColumn("cap", $"c" * UniEpochCap)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pre", coalesce(
        sum($"cap").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        when($"cap" * ($"n_src" - $"rn" + 1L) <= $"budget" - $"pre", 1L)
          .otherwise(0L))
      .localCheckpoint(true)
    val rem = ranked.agg(
      (first($"budget") - sum(when($"capped" === 1L, $"cap").otherwise(0L)))
        .as("r_budget"),
      (first($"n_src") - sum($"capped")).as("m_uncapped"))
    ranked.crossJoin(broadcast(rem))
      .withColumn("alloc",
        when($"capped" === 1L, $"cap")
          .otherwise(floor($"r_budget" / $"m_uncapped").cast("long")))
      .select($"source", $"c".as("n_chars_src"), $"cap", $"capped", $"alloc",
        QueryUtil.halfUp4($"alloc".cast("double") / $"c".cast("double"))
          .as("epochs"))
      .orderBy("source")
  }

  private val unimaxOracle =
    s"""WITH src AS MATERIALIZED (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS c
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot_c,
       |               CAST(count(*) AS BIGINT) AS n_src FROM src),
       |ranked AS MATERIALIZED (
       |  SELECT source, c, tot_c // 2 AS budget, c * $UniEpochCap AS cap,
       |         n_src,
       |         CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS rn,
       |         COALESCE(sum(c * $UniEpochCap) OVER (
       |             ORDER BY c, source
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           0) AS pre
       |  FROM src, tot),
       |flagged AS MATERIALIZED (
       |  SELECT *, CASE WHEN cap * (n_src - rn + 1) <= budget - pre
       |                 THEN 1 ELSE 0 END AS capped
       |  FROM ranked),
       |rem AS (
       |  SELECT CAST(any_value(budget)
       |           - sum(CASE WHEN capped = 1 THEN cap ELSE 0 END) AS BIGINT)
       |           AS r_budget,
       |         CAST(any_value(n_src) - sum(capped) AS BIGINT) AS m_uncapped
       |  FROM flagged)
       |SELECT source, c AS n_chars_src, cap, CAST(capped AS BIGINT) AS capped,
       |       CASE WHEN capped = 1 THEN cap
       |            ELSE r_budget // m_uncapped END AS alloc,
       |       floor((CASE WHEN capped = 1 THEN cap
       |                   ELSE r_budget // m_uncapped END)
       |             / CAST(c AS DOUBLE) * 10000 + 0.5) / 10000.0 AS epochs
       |FROM flagged, rem
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- x254

  /** x254: simple Good-Turing count-of-counts smoothing (Gale & Sampson
    * 1995, the pre-regression "Turing estimate" table) over whitespace
    * unigrams: for each observed frequency r, the species count `N_r`,
    * the adjusted count `r* = (r+1) N_{r+1} / N_r` (falling back to the
    * raw r when no species occurs exactly r+1 times — the unsmoothed
    * table's standard gap fallback), and the total probability mass
    * `r* N_r / N` the estimate assigns to that frequency class. The
    * r=1 row's raw mass `N_1 / N` is the classic leave-one-out unseen
    * estimate. `N_{r+1}` is an equi-join on r+1 (NOT lead() — the next
    * PRESENT frequency is not r+1 once the tail goes sparse).
    *
    * Scale: explode + two hash aggregations (term counts, then
    * count-of-counts); the count-of-counts frame is tiny (distinct
    * frequency values), so the final join/normalize is free. Doubles
    * divide identical exact integers in both engines — IEEE-identical
    * before the halfUp4. */
  def goodTuring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("r"))
    val cofc = counts.groupBy($"r").agg(count(lit(1)).as("n_species"))
      .localCheckpoint(true)
    val tot = cofc.agg(sum($"r" * $"n_species").as("n_tokens"))
    val nxt = cofc.select(($"r" - 1L).as("r"), $"n_species".as("n_next"))
    cofc.join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("r_star",
        when($"n_next".isNotNull,
          ($"r" + 1L).cast("double") * $"n_next".cast("double")
            / $"n_species".cast("double"))
          .otherwise($"r".cast("double")))
      .select($"r", $"n_species",
        QueryUtil.halfUp4($"r_star").as("r_star"),
        QueryUtil.halfUp4($"r_star" * $"n_species".cast("double")
          / $"n_tokens".cast("double")).as("mass"))
      .orderBy("r")
  }

  private val goodTuringOracle =
    """WITH counts AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS r
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term),
      |cofc AS MATERIALIZED (
      |  SELECT r, CAST(count(*) AS BIGINT) AS n_species
      |  FROM counts GROUP BY r),
      |tot AS (SELECT CAST(sum(r * n_species) AS BIGINT) AS n_tokens FROM cofc),
      |gt AS (
      |  SELECT c.r, c.n_species,
      |         CASE WHEN n.n_species IS NOT NULL
      |              THEN (c.r + 1) * CAST(n.n_species AS DOUBLE)
      |                   / CAST(c.n_species AS DOUBLE)
      |              ELSE CAST(c.r AS DOUBLE) END AS r_star
      |  FROM cofc c LEFT JOIN cofc n ON n.r = c.r + 1)
      |SELECT r, n_species,
      |       floor(r_star * 10000 + 0.5) / 10000.0 AS r_star,
      |       floor(r_star * n_species / CAST(n_tokens AS DOUBLE) * 10000 + 0.5)
      |         / 10000.0 AS mass
      |FROM gt, tot
      |ORDER BY r""".stripMargin

  // ---------------------------------------------------------------- x255

  /** x255: D4-style cluster prototype pruning (Tirumala et al. 2023 —
    * the SemDeDup-then-prune-prototypes recipe): assign every embedding
    * to its nearest fixed centroid (x34's seed quantizer, cosine argmax
    * with the repo's unrounded-ranking-key contract, cent_id
    * tie-break), rank each cluster by centroid-cosine DESCENDING (most
    * prototypical first), and drop the top 1/[[ProtoDropDen]] — the
    * near-centroid mass D4 removes because it is semantically
    * redundant. Emits the per-cluster audit: sizes, drop counts, and
    * the kept band's cosine envelope.
    *
    * Scale: one broadcast-centroid assignment pass (|corpus| x K dot
    * products, map-side — x34's shape) and one per-cluster window rank;
    * no pairwise work anywhere, which is exactly why D4 scales where
    * all-pairs semantic dedup cannot. */
  def prototypePrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val cents = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"), $"nrm".as("cn"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id",
        (Similarity.dot($"embedding", $"cv") / ($"nrm" * $"cn")).as("ccos"))
      .withColumn("arn", row_number().over(wAssign)).filter($"arn" === 1)
      .select($"vec_id", $"cent_id", $"ccos")
    val wProto = Window.partitionBy($"cent_id").orderBy($"ccos".desc, $"vec_id")
    val wSize = Window.partitionBy($"cent_id")
    assigned
      .withColumn("prk", row_number().over(wProto).cast("long"))
      .withColumn("n_vecs", count(lit(1)).over(wSize))
      .withColumn("n_drop", ($"n_vecs" / ProtoDropDen).cast("long"))
      .filter($"prk" > $"n_drop")
      .groupBy($"cent_id")
      .agg(first($"n_vecs").as("n_vecs"), first($"n_drop").as("n_drop"),
        QueryUtil.halfUp4(min($"ccos")).as("min_kept"),
        QueryUtil.halfUp4(max($"ccos")).as("max_kept"))
      .orderBy("cent_id")
  }

  private val protoOracle = {
    val dot = SimilarityQueries.dotSql("e.embedding", "c.embedding")
    s"""WITH cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, embedding,
       |         sqrt(${SimilarityQueries.dotSql("embedding", "embedding")}) AS cn
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |asg AS MATERIALIZED (
       |  SELECT vec_id, cent_id, ccos FROM (
       |    SELECT e.vec_id, c.cent_id,
       |           $dot / (sqrt(${SimilarityQueries.dotSql("e.embedding", "e.embedding")}) * c.cn) AS ccos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $dot / (sqrt(${SimilarityQueries.dotSql("e.embedding", "e.embedding")}) * c.cn) DESC,
       |                                       c.cent_id) AS arn
       |    FROM embeddings e CROSS JOIN cents c)
       |  WHERE arn = 1),
       |ranked AS (
       |  SELECT cent_id, ccos,
       |         CAST(row_number() OVER (PARTITION BY cent_id
       |                                 ORDER BY ccos DESC, vec_id) AS BIGINT) AS prk,
       |         CAST(count(*) OVER (PARTITION BY cent_id) AS BIGINT) AS n_vecs
       |  FROM asg)
       |SELECT cent_id, any_value(n_vecs) AS n_vecs,
       |       any_value(n_vecs // $ProtoDropDen) AS n_drop,
       |       floor(min(ccos) * 10000 + 0.5) / 10000.0 AS min_kept,
       |       floor(max(ccos) * 10000 + 0.5) / 10000.0 AS max_kept
       |FROM ranked
       |WHERE prk > n_vecs // $ProtoDropDen
       |GROUP BY cent_id
       |ORDER BY cent_id""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x253_unimax_alloc",
      "UniMax epoch-capped budget water-filling across sources",
      unimaxAlloc, Some(unimaxOracle)),
    QueryDef("x254_good_turing",
      "simple Good-Turing count-of-counts frequency smoothing",
      goodTuring, Some(goodTuringOracle)),
    QueryDef("x255_prototype_prune",
      "D4-style cluster prototype pruning with per-cluster audit",
      prototypePrune, Some(protoOracle)))
}
