package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 fourteenth tier: streaming-drift and retrieval-eval
  * completions — the Page–Hinkley test (the classic sequential
  * change-detection statistic used by online-ML drift monitors; CUSUM's
  * mean-tracking sibling, complementing x60/x271/x315) and Mean Average
  * Precision (the one canonical ranking metric the eval suite — MRR x83,
  * nDCG x87, AUC x113, pass@k x327 — still lacked), computed float-free
  * by the x327 macro-average convention.
  */
object Round13Queries14 {

  /** PH drift allowance δ (micro-units): 2 events/day. */
  private val PhDeltaMicro = 2000000L
  /** PH alarm threshold λ (micro-units): 50 cumulative events. */
  private val PhLambdaMicro = 50000000L
  /** Emitted trace length (top PH days). */
  private val PhTopK = 20

  // ---------------------------------------------------------------- x341

  /** x341: Page–Hinkley test over the daily event-count series — m_T =
    * Σ_{t≤T}(x_t − x̄_t − δ) with x̄_t the RUNNING mean, PH_T =
    * m_T − min_{s≤T} m_s, alarm when PH exceeds λ. The running mean is
    * micro-quantized with truncating division ((S_t·10⁶) DIV t), so
    * deviations, their running sum, the running min and PH are all
    * BIGINT — the entire detector state is exact integers, which is
    * precisely what makes it replayable as a stream (same x317/x330
    * fixed-point convention). Emits the top-[[PhTopK]] days by PH
    * (ties → earlier day) with the alarm flag.
    *
    * Scale: one map-side-combinable groupBy(day) corpus pass; the
    * detector windows run over the day census (30 rows here, ~10⁴ rows
    * for decades of days — census-scale regardless of corpus size). */
  def pageHinkley(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(to_date($"ts").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("x"))
    val wc = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    val staged = daily
      .withColumn("t", row_number().over(Window.orderBy($"day")).cast("long"))
      .withColumn("s", sum($"x").over(wc))
      .withColumn("mbar", expr("(s * 1000000) DIV t"))
      .withColumn("dev", $"x" * 1000000L - $"mbar" - lit(PhDeltaMicro))
      .withColumn("m_t", sum($"dev").over(wc))
      .withColumn("mn", min($"m_t").over(wc))
      .withColumn("ph", $"m_t" - $"mn")
    staged
      .withColumn("rk", row_number().over(Window.orderBy($"ph".desc, $"day")))
      .filter($"rk" <= PhTopK)
      .select($"day", $"x", $"m_t", $"ph",
        when($"ph" > PhLambdaMicro, 1L).otherwise(0L).as("alarm"))
      .orderBy($"day")
  }

  private val pageHinkleyOracle =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |staged AS (
       |  SELECT day, x,
       |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |         CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
       |  FROM daily),
       |dev AS (
       |  SELECT *, x * 1000000 - ((s * 1000000) // t) - $PhDeltaMicro AS dev
       |  FROM staged),
       |acc AS (
       |  SELECT *,
       |         CAST(sum(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m_t
       |  FROM dev),
       |ph AS (
       |  SELECT *, m_t - min(m_t) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS ph
       |  FROM acc),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY ph DESC, day) AS rk FROM ph)
       |SELECT day, x, m_t, ph,
       |       CAST(CASE WHEN ph > $PhLambdaMicro THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM ranked WHERE rk <= $PhTopK
       |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- x342

  /** x342: Mean Average Precision of the dense-retrieval arm (x83's
    * query/corpus frame: every vec_id % 100 = 0 embedding queries the
    * rest of the corpus by the x30 cosine key; a doc is relevant iff it
    * shares the query's label). AP_q = (Σ_{k rel} P@k)/R with every
    * precision term micro-quantized ((cumrel·10⁶) DIV k) so the per-query
    * sum and the corpus-level macro average are pure BIGINT — no
    * accumulation-order-dependent double sums (the x327 float-free
    * macro-average convention). Emits per-query (R, Σp, AP micro) plus
    * the global MAP replicated.
    *
    * Scale: the one pair scan is broadcast-queries × corpus (x83's
    * audited shape); everything downstream is per-query census sums. */
  def mapEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"label".as("qlab"), $"embedding".as("qv"),
        $"nrm".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val wrel = Window.partitionBy($"q_id").orderBy($"rk")
      .rowsBetween(Window.unboundedPreceding, 0)
    val perQuery = emb.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"qlab", $"vec_id", $"label",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("rel", ($"label" === $"qlab").cast("long"))
      .withColumn("cumrel", sum($"rel").over(wrel))
      .withColumn("p_micro",
        when($"rel" === 1L, expr("(cumrel * 1000000) DIV rk")).otherwise(0L))
      .groupBy($"q_id")
      .agg(sum($"rel").as("n_rel"), sum($"p_micro").as("sum_p"))
      .withColumn("ap_micro",
        when($"n_rel" > 0L, expr("sum_p DIV n_rel")).otherwise(0L))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perQuery
      .withColumn("sum_ap_all", sum($"ap_micro").over(wAll))
      .withColumn("n_q", count(lit(1)).over(wAll))
      .withColumn("map_micro", expr("sum_ap_all DIV n_q"))
      .select($"q_id", $"n_rel", $"sum_p", $"ap_micro", $"map_micro")
      .orderBy($"q_id")
  }

  private val mapEvalOracle =
    s"""WITH q AS (SELECT vec_id AS q_id, label AS qlab, embedding AS qv
       |           FROM embeddings WHERE vec_id % 100 = 0),
       |p AS (SELECT q.q_id, q.qlab, e.vec_id, e.label,
       |        round(${SimilarityQueries.cosineSql("e.embedding", "qv")}, 4) AS cosine
       |      FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
       |r AS (SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk,
       |        CAST(CASE WHEN label = qlab THEN 1 ELSE 0 END AS BIGINT) AS rel
       |      FROM p),
       |c AS (SELECT *, sum(rel) OVER (PARTITION BY q_id ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cumrel
       |      FROM r),
       |pq AS (
       |  SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
       |         CAST(sum(CASE WHEN rel = 1 THEN (cumrel * 1000000) // rk ELSE 0 END) AS BIGINT) AS sum_p
       |  FROM c GROUP BY 1),
       |ap AS (
       |  SELECT *, CASE WHEN n_rel > 0 THEN sum_p // n_rel ELSE 0 END AS ap_micro
       |  FROM pq)
       |SELECT q_id, n_rel, sum_p, ap_micro,
       |       CAST(sum(ap_micro) OVER () // count(*) OVER () AS BIGINT) AS map_micro
       |FROM ap ORDER BY q_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x341_page_hinkley",
      "Page-Hinkley sequential drift detector on daily event counts: all-BIGINT detector state, micro-quantized running mean",
      pageHinkley, Some(pageHinkleyOracle)),
    QueryDef("x342_map_eval",
      "Mean Average Precision of the dense arm: micro-quantized precision terms, float-free macro average (x327 convention)",
      mapEval, Some(mapEvalOracle)))
}
