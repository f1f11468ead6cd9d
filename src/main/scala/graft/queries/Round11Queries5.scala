package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 fifth tier: training-mixture logistics — DoReMi-style
  * domain reweighting (the mixture-OPTIMIZATION step that sits upstream
  * of x53's mixture sampler and x85's temperature reweighting) and
  * curriculum interleaving (the ordering audit downstream of x42's
  * quality scores). Both are pure relational folds: the data-sized pass
  * is one per-domain aggregation; the optimization/ordering itself runs
  * on domain-cardinality frames. */
object Round11Queries5 {

  /** Multiplicative-weights rounds / learning rate for x251 (unrolled
    * identically in the oracle). */
  private val MixRounds = 6
  private val MixEta = "0.5"

  /** Interleave block size for x252's uniformity audit. */
  private val CurBlock = 50
  private val CurBands = 5

  // ---------------------------------------------------------------- x251

  /** x251: DoReMi-lite domain mixture reweighting (Xie et al. 2023,
    * linearized) — [[MixRounds]] multiplicative-weights rounds over the
    * per-domain excess-loss signal: each round computes the
    * mixture-average loss under the CURRENT weights, then tilts every
    * domain by `1 + eta * (loss_d - mix_avg)` (the exp(x) = 1+x
    * linearization of Hedge — deliberate: the repo's cross-engine
    * determinism contract allows ln but not libm exp, and the linear
    * payoff variant is itself a published multiplicative-weights
    * instance), floors at 0.1x to keep weights positive, and
    * renormalizes. Per-doc loss proxy is ln(1+n_chars) quantized to 1e-6
    * fixed point (the x56 surprisal recipe), so the domain loss is a
    * rational of exact integers; per-round mixture averages and weight
    * tilts quantize to fixed point BEFORE their sums, making every
    * accumulation order-free and the trained weights engine-exact (the
    * x35 trained-centroid contract applied to mixture training).
    *
    * Scale: the corpus-sized work is ONE per-source aggregation; the
    * optimization loop runs on a |domains|-row frame (localCheckpointed
    * once), so rounds cost nothing at any corpus size — exactly how a
    * 100 TB mixture fit behaves (proxy losses come from a map-side
    * aggregate; the reweighting itself is driver-scale math kept
    * declarative for the oracle pairing). */
  def doremiMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dom = Tables.documents(spark, dir)
      .select($"source",
        floor(log(lit(1.0) + $"n_chars".cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("l_fp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"l_fp").as("s_fp"))
      .withColumn("loss",
        $"s_fp".cast("double") / $"n_docs".cast("double") / lit(1e6))
      .localCheckpoint(true)
    val nDom = dom.select(count(lit(1)).as("n_dom"))
    val w0 = dom.crossJoin(broadcast(nDom))
      .withColumn("w", lit(1.0) / $"n_dom".cast("double"))
      .select($"source", $"n_docs", $"loss", $"w")
      .localCheckpoint(true)
    val wN = (1 to MixRounds).foldLeft(w0) { (cur, _) =>
      val mix = cur
        .select(floor($"w" * $"loss" * lit(1e12) + lit(0.5)).cast("long").as("c_fp"))
        .agg(sum($"c_fp").as("mix_fp"))
      val tilt = cur.crossJoin(broadcast(mix))
        .withColumn("g",
          greatest(lit(0.1),
            lit(1.0) + lit(MixEta).cast("double")
              * ($"loss" - $"mix_fp".cast("double") / lit(1e12))))
        .withColumn("wq_fp",
          floor($"w" * $"g" * lit(1e9) + lit(0.5)).cast("long"))
        .localCheckpoint(true)
      val tot = tilt.agg(sum($"wq_fp").as("tot_fp"))
      tilt.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"loss",
          ($"wq_fp".cast("double") / $"tot_fp".cast("double")).as("w"))
        .localCheckpoint(true)
    }
    wN.select($"source", $"n_docs",
      QueryUtil.halfUp4($"loss").as("loss"),
      QueryUtil.halfUp4($"w").as("weight"))
      .orderBy("source")
  }

  private def mixRoundSql(r: Int): String = {
    val prev = s"w${r - 1}"
    s"""mix$r AS (
       |  SELECT CAST(sum(CAST(floor(w * loss * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS mix_fp
       |  FROM $prev),
       |tilt$r AS MATERIALIZED (
       |  SELECT source, n_docs, loss,
       |         CAST(floor(w * greatest(0.1,
       |                1.0 + $MixEta * (loss - CAST(mix_fp AS DOUBLE) / 1e12))
       |              * 1e9 + 0.5) AS BIGINT) AS wq_fp
       |  FROM $prev, mix$r),
       |tot$r AS (SELECT CAST(sum(wq_fp) AS BIGINT) AS tot_fp FROM tilt$r),
       |w$r AS MATERIALIZED (
       |  SELECT source, n_docs, loss,
       |         CAST(wq_fp AS DOUBLE) / CAST(tot_fp AS DOUBLE) AS w
       |  FROM tilt$r, tot$r)""".stripMargin
  }

  private val doremiOracle = {
    val rounds = (1 to MixRounds).map(mixRoundSql).mkString(",\n")
    s"""WITH dom AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(CAST(floor(ln(1.0 + CAST(n_chars AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s_fp
       |  FROM documents GROUP BY source),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_dom FROM dom),
       |w0 AS MATERIALIZED (
       |  SELECT source, n_docs,
       |         CAST(s_fp AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e6 AS loss,
       |         1.0 / CAST(n_dom AS DOUBLE) AS w
       |  FROM dom, nd),
       |$rounds
       |SELECT source, n_docs,
       |       floor(loss * 10000 + 0.5) / 10000.0 AS loss,
       |       floor(w * 10000 + 0.5) / 10000.0 AS weight
       |FROM w$MixRounds
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- x252

  /** x252: curriculum interleave audit — easy-to-hard ordering with
    * stratified band round-robin (the standard curriculum-learning
    * schedule that avoids difficulty cliffs between epochs: band docs by
    * difficulty quintile, then interleave bands 1..K cyclically so every
    * training window sees the full difficulty mix while the WITHIN-band
    * order stays easy-first). Difficulty proxy = n_chars (deterministic,
    * doc_id tie-break); position = (rank_within_band - 1) * K + band - 1.
    * The audit groups the curriculum into [[CurBlock]]-position blocks
    * and emits per-(block, band) counts plus each block's difficulty
    * envelope — a uniform interleave shows near-equal band counts per
    * block and monotone envelopes across blocks.
    *
    * Scale: two window ranks over the (score, doc_id) total order — one
    * global ntile, one per-band row_number — then a block×band
    * aggregation; all single-shuffle window work with integer outputs,
    * no driver loop. On a real corpus the global sort is the same
    * range-partitioned total order every epoch-shuffle (x52) already
    * pays. */
  def curriculumInterleave(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"n_chars")
    val wAll = Window.orderBy($"n_chars", $"doc_id")
    val wBand = Window.partitionBy($"band").orderBy($"n_chars", $"doc_id")
    docs
      .withColumn("band", ntile(CurBands).over(wAll))
      .withColumn("rn", row_number().over(wBand))
      .withColumn("pos", ($"rn".cast("long") - 1L) * CurBands + $"band".cast("long") - 1L)
      .withColumn("blk", ($"pos" / CurBlock).cast("long"))
      .groupBy($"blk", $"band")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .select($"blk", $"band".cast("long").as("band"), $"n_docs",
        $"min_chars", $"max_chars")
      .orderBy("blk", "band")
  }

  private val curriculumOracle =
    s"""WITH b AS (
       |  SELECT doc_id, n_chars,
       |         ntile($CurBands) OVER (ORDER BY n_chars, doc_id) AS band
       |  FROM documents),
       |p AS (
       |  SELECT band, n_chars,
       |         (CAST(row_number() OVER (PARTITION BY band ORDER BY n_chars, doc_id) AS BIGINT) - 1)
       |           * $CurBands + band - 1 AS pos
       |  FROM b)
       |SELECT pos // $CurBlock AS blk, CAST(band AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(min(n_chars) AS BIGINT) AS min_chars,
       |       CAST(max(n_chars) AS BIGINT) AS max_chars
       |FROM p
       |GROUP BY 1, 2
       |ORDER BY blk, band""".stripMargin

  // ---------------------------------------------------------------- defs

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x251_doremi_mix",
      "DoReMi-lite multiplicative-weights domain mixture reweighting",
      doremiMix, Some(doremiOracle)),
    QueryDef("x252_curriculum_interleave",
      "stratified curriculum band interleave with block uniformity audit",
      curriculumInterleave, Some(curriculumOracle)))
}
