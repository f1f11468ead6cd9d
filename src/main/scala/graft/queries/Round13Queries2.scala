package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 second tier: inverse-degree-weighted link prediction (the
  * resource-allocation index), single-changepoint detection by exact
  * SSE-gain binary segmentation, and the filtered-ANN pre-vs-post-filter
  * recall audit — the modern vector-search question "how much does
  * post-filtering a global top-K′ lose against filtering first?".
  */
object Round13Queries2 {

  // ---------------------------------------------------------------- x314

  /** Part-degree cap shared with x66 (drops hub parts whose pair lists
    * explode quadratically and carry no affinity signal anyway). */
  private val RaDegCap = 20
  /** Fixed-point scale for the 1/deg weights (integer division keeps the
    * score a BIGINT both engines sum identically). */
  private val RaScale = 1000000000L

  /** x314: resource-allocation link prediction over the supplier–part
    * bipartite graph (Zhou–Lü–Zhang's RA index, the inverse-degree
    * counterpart of x66's raw shared-count Jaccard): a candidate
    * supplier pair scores Σ_z 1/deg(z) over shared parts z, so a part
    * supplied by few suppliers certifies affinity while a commodity
    * part contributes almost nothing. Weights are the EXACT integers
    * 10⁹ DIV deg(z) — the score is a BIGINT sum, order-free, and the
    * top-30 ranking never touches a double.
    *
    * Scale: same bounded projection as x66 — per-part pair lists are
    * ≤ cap² after the degree cap, the degree frames broadcast, and the
    * pair aggregation is one hash shuffle on (s1, s2). */
  def resourceAllocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("pk"), $"l_suppkey".as("sk")).distinct()
      .localCheckpoint(true) // referenced 3x: degree frame, both pair sides
    val pdeg = ps.groupBy($"pk").agg(count(lit(1)).as("d"))
      .filter($"d" <= RaDegCap)
      .select($"pk", expr(s"${RaScale}L DIV d").as("wq"))
    val ok = ps.join(broadcast(pdeg), "pk")
    ok.select($"pk", $"wq", $"sk".as("s1"))
      .join(ok.select($"pk", $"sk".as("s2")), "pk")
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("shared"), sum($"wq").as("ra_score"))
      .orderBy($"ra_score".desc, $"s1", $"s2")
      .limit(30)
  }

  private val resourceAllocationOracle =
    s"""WITH ps AS MATERIALIZED (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |pdeg AS (
       |  SELECT pk, $RaScale // count(*) AS wq FROM ps GROUP BY 1
       |  HAVING count(*) <= $RaDegCap),
       |ok AS MATERIALIZED (
       |  SELECT ps.pk, ps.sk, pdeg.wq FROM ps JOIN pdeg ON ps.pk = pdeg.pk)
       |SELECT a.sk AS s1, b.sk AS s2, CAST(count(*) AS BIGINT) AS shared,
       |       CAST(sum(a.wq) AS BIGINT) AS ra_score
       |FROM ok a JOIN ok b ON a.pk = b.pk AND a.sk < b.sk
       |GROUP BY 1, 2
       |ORDER BY ra_score DESC, s1, s2
       |LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- x315

  /** x315: single-changepoint detection by binary segmentation — for
    * each event type's daily revenue series, the split k maximizing the
    * SSE reduction, i.e. maximizing S_L²/n_L + S_R²/n_R (Σx² is
    * constant across splits, prefix sums S are exact BIGINT cents).
    * The ranking key is that expression as a double — both engines
    * derive it from identical integers with identical arithmetic, so
    * the argmax (tie-broken by earliest day) is engine-stable without
    * any rounding of the KEY (the repo's unrounded-ranking rule); only
    * the REPORTED gain is quantized.
    *
    * Scale: the series census (type × day) is tiny and grows with the
    * time span, not the event count; candidates are one window pass
    * over it. The full-data pass is one map-side-combinable groupBy. */
  def changepointBinseg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Round13Queries3.dailyCents(spark, dir)
      .withColumnRenamed("cents", "s")
    val wOrd = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy($"event_type")
    val cand = daily
      .withColumn("i", count(lit(1)).over(
        Window.partitionBy($"event_type").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("sl", sum($"s").over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("st", sum($"s").over(wAll))
      .filter($"i" < $"n") // a split needs a non-empty right side
    def d(c: Column) = c.cast("double")
    val keyed = cand.withColumn("gain_key",
      d($"sl") * d($"sl") / d($"i")
        + d($"st" - $"sl") * d($"st" - $"sl") / d($"n" - $"i"))
    val w = Window.partitionBy($"event_type")
      .orderBy($"gain_key".desc, $"day")
    keyed.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"event_type", $"day".as("split_day"), $"n".as("n_days"),
        $"i".as("n_left"), $"sl".as("sum_left"), $"st".as("sum_total"),
        QueryUtil.halfUp4($"gain_key"
          - d($"st") * d($"st") / d($"n")).as("gain"))
      .orderBy($"event_type")
  }

  private val changepointOracle =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type,
      |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
      |  FROM events GROUP BY 1, 2),
      |cand AS (
      |  SELECT event_type, day,
      |         CAST(row_number() OVER wo AS BIGINT) AS i,
      |         CAST(sum(s) OVER (PARTITION BY event_type ORDER BY day
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
      |         CAST(count(*) OVER wa AS BIGINT) AS n,
      |         CAST(sum(s) OVER wa AS BIGINT) AS st
      |  FROM daily
      |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
      |         wa AS (PARTITION BY event_type)),
      |keyed AS (
      |  SELECT *,
      |         CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(i AS DOUBLE)
      |         + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
      |           / CAST(n - i AS DOUBLE) AS gain_key
      |  FROM cand WHERE i < n),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY gain_key DESC, day) AS rk
      |  FROM keyed)
      |SELECT event_type, day AS split_day, n AS n_days, i AS n_left,
      |       sl AS sum_left, st AS sum_total,
      |       floor((gain_key - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |                         / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS gain
      |FROM best WHERE rk = 1
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- x316

  /** Exact-truth depth and the post-filter over-fetch depth. */
  private val FannK = 5
  private val FannKPrime = 15

  /** x316: filtered ANN — pre-filter vs post-filter recall. The modern
    * vector-store question: when a query carries a predicate (here:
    * same label), you can filter THEN search (exact per-predicate
    * top-[[FannK]] — the truth), or search a global top-[[FannKPrime]]
    * THEN filter (cheap against a prebuilt unfiltered index, but
    * lossy when the predicate is selective). Both rankings use the
    * same (cosine desc, vec_id) order, so the post-filter hit set is
    * exactly {label-match ∧ rk_pre ≤ K ∧ rk_all ≤ K′} — one broadcast
    * pair scan, two ranking windows, no second pass. Emits per query
    * the truth size, the hits a post-filter search would return, and
    * the recall it loses.
    *
    * Scale: queries broadcast, corpus scanned once; at corpus scale the
    * two global rankings become x213's bounded topk_pairs aggregate
    * (O(n·k) exchange) instead of the ranking window. Label selectivity
    * is 1/10 here, so K′ = 3K recovers most but not all truth —
    * the audit is the point. */
  def filteredAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding",
        graft.operators.Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"embedding".as("qv"), $"nrm".as("qn"))
    val pairs = emb.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"vec_id",
        ($"label" === $"q_label").as("m"),
        round(graft.operators.Similarity.dot($"qv", $"embedding")
          / ($"qn" * $"nrm"), 4).as("cosine"))
    val wAll = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val wPre = Window.partitionBy($"q_id", $"m").orderBy($"cosine".desc, $"vec_id")
    pairs
      .withColumn("rk_all", row_number().over(wAll))
      .withColumn("rk_m", row_number().over(wPre))
      .groupBy($"q_id", $"q_label")
      .agg(
        sum(when($"m" && $"rk_m" <= FannK, 1L).otherwise(0L)).as("n_true"),
        sum(when($"m" && $"rk_m" <= FannK && $"rk_all" <= FannKPrime, 1L)
          .otherwise(0L)).as("hits"))
      .select($"q_id", $"q_label", $"n_true", $"hits",
        QueryUtil.halfUp4($"hits".cast("double") / $"n_true".cast("double"))
          .as("recall"))
      .orderBy($"q_id")
  }

  private val filteredAnnOracle =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, label AS q_label, embedding AS qv
       |  FROM embeddings WHERE vec_id % 100 = 0),
       |pairs AS (
       |  SELECT q_id, q_label, e.vec_id AS vec_id,
       |         (e.label = q_label) AS m,
       |         round(${SimilarityQueries.cosineSql("qv", "e.embedding")}, 4) AS cosine
       |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY cosine DESC, vec_id) AS rk_all,
       |         row_number() OVER (PARTITION BY q_id, m
       |                            ORDER BY cosine DESC, vec_id) AS rk_m
       |  FROM pairs)
       |SELECT q_id, q_label,
       |       CAST(sum(CASE WHEN m AND rk_m <= $FannK THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |       CAST(sum(CASE WHEN m AND rk_m <= $FannK AND rk_all <= $FannKPrime
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |       floor(CAST(sum(CASE WHEN m AND rk_m <= $FannK AND rk_all <= $FannKPrime
       |                          THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(sum(CASE WHEN m AND rk_m <= $FannK THEN 1 ELSE 0 END) AS DOUBLE)
       |             * 10000 + 0.5) / 10000.0 AS recall
       |FROM ranked
       |GROUP BY q_id, q_label
       |ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x314_resource_allocation",
      "RA-index link prediction on the supplier-part bipartite graph: exact integer 1/deg weights, bounded projection, BIGINT ranking",
      resourceAllocation, Some(resourceAllocationOracle)),
    QueryDef("x315_changepoint_binseg",
      "single changepoint per event type by binary segmentation: exact BIGINT prefix sums, unrounded SSE-gain ranking key",
      changepointBinseg, Some(changepointOracle)),
    QueryDef("x316_filtered_ann",
      "filtered-ANN recall audit: exact pre-filter top-k truth vs post-filtered global top-K' from one pair scan and two windows",
      filteredAnn, Some(filteredAnnOracle)))
}
