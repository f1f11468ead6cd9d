package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 seventh tier: three published distributed-systems/sketching
  * primitives a 100 TB pipeline leans on — priority sampling for
  * unbiased subset-sum estimates (next to x59's A-ES sampler), a
  * rendezvous-hashing shard rebalance audit (next to x28's shard
  * manifest), and Count-Sketch heavy-hitter estimation (next to x24's
  * count-min). All hashes are deterministic md5 slices so every
  * estimator is bit-reproducible and oracle-pairable.
  */
object Round11Queries7 {

  /** Priority-sample size k (threshold τ = the (k+1)-th priority). */
  private val PriK = 64

  /** Count-Sketch geometry: d rows × w buckets, top-K audit terms. */
  private val CsRows = 5
  private val CsBuckets = 256L
  private val CsTopK = 20

  /** DuckDB has no conv(x, 16, 10): parse `n` hex chars of `expr`
    * starting at 1-based `start` by digit multiply-add, seeded with a
    * BIGINT 0 so >8-digit values cannot overflow INT32. */
  private def hexSql(expr: String, start: Int, n: Int): String =
    (start until start + n)
      .map(i => s"(strpos('0123456789abcdef', substr($expr, $i, 1)) - 1)")
      .foldLeft("CAST(0 AS BIGINT)")((a, b) => s"($a * 16 + $b)")

  // ---------------------------------------------------------------- x256

  /** x256: priority sampling (Duffield, Lund & Thorup 2007) over
    * documents weighted by n_chars: priority q_i = w_i / u_i with a
    * deterministic uniform u_i from a 16-bit md5 slice, keep the k
    * highest priorities, set τ = the (k+1)-th, and estimate any subset
    * sum as Σ max(w_i, τ) over sampled members — unbiased for every
    * subset simultaneously. Audited here per source: estimate vs exact
    * character mass and the signed relative error. Estimates are
    * quantized half-up to 1e-4 BEFORE summing (integer sums are
    * accumulation-order-free, the repo's trained-aggregate contract);
    * the ranking key q itself stays unrounded (identical IEEE doubles
    * in both engines — rounding IS the divergence channel).
    *
    * Scale: the corpus pass is TakeOrderedAndProject (per-partition
    * top-(k+1), driver merges k+1 rows per partition — no global sort)
    * plus one per-source aggregation; everything after runs on k+1
    * rows. That is exactly the shape a 100 TB "estimate every
    * source/domain mass from one tiny sample" audit needs. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = conv(substring(md5(concat_ws("|", lit("psample"), col("doc_id"))), 1, 4), 16, 10)
      .cast("long")
    val base = Tables.documents(spark, dir)
      .filter($"n_chars" > 0)
      .select($"source", $"doc_id", $"n_chars",
        ($"n_chars".cast("double") / ((h.cast("double") + lit(0.5)) / lit(65536.0))).as("q"))
    val ranked = base.orderBy($"q".desc, $"doc_id").limit(PriK + 1)
      .withColumn("rn", row_number().over(Window.orderBy($"q".desc, $"doc_id")))
      .localCheckpoint(true)
    val tau = ranked.filter($"rn" === PriK + 1).select($"q".as("tau"))
    val est = ranked.filter($"rn" <= PriK).crossJoin(broadcast(tau))
      .select($"source",
        floor(greatest($"n_chars".cast("double"), $"tau") * 10000 + lit(0.5))
          .cast("long").as("estq"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"), sum($"estq").as("sum_estq"))
    Tables.documents(spark, dir).filter($"n_chars" > 0)
      .groupBy($"source").agg(sum($"n_chars").as("exact_sum"))
      .join(est, Seq("source"), "left")
      .select($"source", $"exact_sum",
        coalesce($"n_sampled", lit(0L)).as("n_sampled"),
        (coalesce($"sum_estq", lit(0L)) / lit(10000.0)).as("est_sum"),
        QueryUtil.halfUp4(
          (coalesce($"sum_estq", lit(0L)) / lit(10000.0) - $"exact_sum".cast("double"))
            / $"exact_sum".cast("double")).as("rel_err"))
      .orderBy("source")
  }

  private val prioritySampleOracle = {
    val h = hexSql("md5(concat_ws('|', 'psample', CAST(doc_id AS VARCHAR)))", 1, 4)
    s"""WITH base AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(n_chars AS DOUBLE) / ((CAST($h AS DOUBLE) + 0.5) / 65536.0) AS q
       |  FROM documents WHERE n_chars > 0),
       |ranked AS MATERIALIZED (
       |  SELECT *, row_number() OVER (ORDER BY q DESC, doc_id) AS rn
       |  FROM (SELECT * FROM base ORDER BY q DESC, doc_id LIMIT ${PriK + 1})),
       |tau AS (SELECT q AS tau FROM ranked WHERE rn = ${PriK + 1}),
       |est AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
       |         CAST(sum(CAST(floor(greatest(CAST(n_chars AS DOUBLE), tau) * 10000 + 0.5)
       |                       AS BIGINT)) AS BIGINT) AS sum_estq
       |  FROM ranked, tau WHERE rn <= $PriK GROUP BY source),
       |exact AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS exact_sum
       |  FROM documents WHERE n_chars > 0 GROUP BY source)
       |SELECT e.source, exact_sum,
       |       CAST(COALESCE(n_sampled, 0) AS BIGINT) AS n_sampled,
       |       CAST(COALESCE(sum_estq, 0) AS BIGINT) / 10000.0 AS est_sum,
       |       floor((CAST(COALESCE(sum_estq, 0) AS BIGINT) / 10000.0
       |              - CAST(exact_sum AS DOUBLE)) / CAST(exact_sum AS DOUBLE)
       |             * 10000 + 0.5) / 10000.0 AS rel_err
       |FROM exact e LEFT JOIN est USING (source)
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- x257

  /** x257: rendezvous-hashing (HRW, Thaler & Ravishankar 1996) shard
    * rebalance audit — the ops question behind every reshard at 100 TB:
    * growing 16 → 17 shards, how many documents MOVE? HRW assigns each
    * doc to argmax over shards of h(doc, shard); adding shard 17 moves
    * only the docs whose new hash wins (≈ N/17), versus mod-hashing
    * which remaps ≈ N·16/17 of the corpus. The argmax is computed as a
    * pure integer max over k = h·32 + s (40-bit hash, tie-free by
    * construction since s is embedded in the key), so the per-doc
    * reduction is a map-side partial aggregate, not a window. Emits one
    * audit row per scheme: moved count/fraction plus the 17-shard
    * max/min loads (HRW inherits md5 balance; mod does too — the
    * difference is pure movement).
    *
    * Scale: the corpus pass is one explode(17) + hash aggregation on
    * doc_id (map-side partials, no window); summaries run on |shards|-
    * and 2-row frames. At 1000 executors the explode factor is a
    * constant 17 and the agg keys are unique doc ids — embarrassingly
    * parallel. */
  def hrwRebalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hrwH = conv(substring(md5(concat_ws("|", lit("hrw"), col("doc_id"), col("s"))), 1, 10), 16, 10)
      .cast("long")
    val modH = conv(substring(md5(concat_ws("|", lit("mod"), col("doc_id"))), 1, 10), 16, 10)
      .cast("long")
    val asg = Tables.documents(spark, dir)
      .select($"doc_id", modH.as("h0"), explode(sequence(lit(0), lit(16))).as("s"))
      .withColumn("k", hrwH * lit(32L) + $"s".cast("long"))
      .groupBy($"doc_id", $"h0")
      .agg((max($"k") % 32).as("hrw17"),
        (max(when($"s" < 16, $"k")) % 32).as("hrw16"))
      .withColumn("mod16", $"h0" % 16)
      .withColumn("mod17", $"h0" % 17)
      .localCheckpoint(true)
    def schemeRow(name: String, c16: String, c17: String): DataFrame = {
      val moved = asg.agg(count(lit(1)).as("n_docs"),
        sum(when(col(c16) =!= col(c17), 1L).otherwise(0L)).as("n_moved"))
      val loads = asg.groupBy(col(c17)).agg(count(lit(1)).as("cnt"))
        .agg(max($"cnt").as("max_load"), min($"cnt").as("min_load"))
      moved.crossJoin(loads)
        .select(lit(name).as("scheme"), $"n_docs", $"n_moved",
          QueryUtil.halfUp4($"n_moved".cast("double") / $"n_docs".cast("double"))
            .as("moved_frac"),
          $"max_load", $"min_load")
    }
    schemeRow("hrw", "hrw16", "hrw17")
      .unionByName(schemeRow("mod", "mod16", "mod17"))
      .orderBy("scheme")
  }

  private val hrwRebalanceOracle = {
    val hrwH = hexSql("md5(concat_ws('|', 'hrw', CAST(doc_id AS VARCHAR), CAST(s AS VARCHAR)))", 1, 10)
    val modH = hexSql("md5(concat_ws('|', 'mod', CAST(doc_id AS VARCHAR)))", 1, 10)
    s"""WITH asg AS MATERIALIZED (
       |  SELECT doc_id, h0,
       |         max(k) % 32 AS hrw17,
       |         max(CASE WHEN s < 16 THEN k END) % 32 AS hrw16,
       |         h0 % 16 AS mod16, h0 % 17 AS mod17
       |  FROM (SELECT doc_id, $modH AS h0, s, $hrwH * 32 + s AS k
       |        FROM documents, (SELECT unnest(range(0, 17)) AS s))
       |  GROUP BY doc_id, h0),
       |hrw_m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |          FROM asg),
       |hrw_l AS (SELECT CAST(max(cnt) AS BIGINT) AS max_load,
       |                 CAST(min(cnt) AS BIGINT) AS min_load
       |          FROM (SELECT count(*) AS cnt FROM asg GROUP BY hrw17)),
       |mod_m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(CASE WHEN mod16 <> mod17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |          FROM asg),
       |mod_l AS (SELECT CAST(max(cnt) AS BIGINT) AS max_load,
       |                 CAST(min(cnt) AS BIGINT) AS min_load
       |          FROM (SELECT count(*) AS cnt FROM asg GROUP BY mod17))
       |SELECT * FROM (
       |  SELECT 'hrw' AS scheme, n_docs, n_moved,
       |         floor(CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE) * 10000 + 0.5)
       |           / 10000.0 AS moved_frac, max_load, min_load
       |  FROM hrw_m, hrw_l
       |  UNION ALL
       |  SELECT 'mod' AS scheme, n_docs, n_moved,
       |         floor(CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE) * 10000 + 0.5)
       |           / 10000.0 AS moved_frac, max_load, min_load
       |  FROM mod_m, mod_l)
       |ORDER BY scheme""".stripMargin
  }

  // ---------------------------------------------------------------- x258

  /** x258: Count-Sketch heavy-hitter estimation (Charikar, Chen &
    * Farach-Colton 2002) over whitespace unigrams — the SIGNED cousin
    * of x24's count-min: d = [[CsRows]] hash rows × w = [[CsBuckets]]
    * buckets, each term contributes sign(r,t)·c_t to bucket b(r,t), and
    * a term's estimate is the MEDIAN over rows of sign·bucket_sum —
    * unbiased (collisions cancel in expectation where count-min only
    * over-counts). Audited on the top-[[CsTopK]] exact terms: estimate
    * vs true count and absolute error. Sign and bucket come from
    * disjoint slices of ONE md5 per (row, term); all arithmetic is
    * exact BIGINT, and the 5-way median is the literal 3rd-smallest via
    * row_number — no engine median() semantics in play.
    *
    * Scale: one corpus explode + hash agg for term counts; the sketch
    * itself is vocab-sized input aggregated to d×w = 1280 cells — and
    * because Count-Sketch is LINEAR, Spark's map-side partial sums ARE
    * the published sketch-merge operation, so the same plan at 1000
    * executors builds per-partition sketches and adds them. Estimation
    * touches only the broadcast top-K join. */
  def countSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val hashed = counts
      .select($"term", $"c", explode(sequence(lit(0), lit(CsRows - 1))).as("r"))
      .withColumn("md", md5(concat_ws("|", lit("cs"), $"r", $"term")))
      .withColumn("b", conv(substring($"md", 1, 5), 16, 10).cast("long") % CsBuckets)
      .withColumn("sgn",
        when(conv(substring($"md", 6, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L))
    val sketch = hashed.groupBy($"r", $"b").agg(sum($"sgn" * $"c").as("sv"))
    val top = counts.orderBy($"c".desc, $"term").limit(CsTopK)
    val est = hashed.join(broadcast(top.select($"term")), Seq("term"))
      .join(broadcast(sketch), Seq("r", "b"))
      .select($"term", $"c", $"r", ($"sgn" * $"sv").as("est"))
    est
      .withColumn("rn", row_number().over(
        Window.partitionBy($"term").orderBy($"est", $"r")))
      .filter($"rn" === (CsRows + 1) / 2)
      .select($"term", $"c", $"est".as("est_med"), abs($"est" - $"c").as("abs_err"))
      .orderBy($"c".desc, $"term")
  }

  private val countSketchOracle = {
    val b = hexSql("md", 1, 5)
    val sgn = hexSql("md", 6, 1)
    s"""WITH counts AS MATERIALIZED (
       |  SELECT term, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term),
       |hb AS MATERIALIZED (
       |  SELECT term, c, r, $b % $CsBuckets AS b,
       |         CASE WHEN $sgn % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT term, c, s AS r,
       |               md5(concat_ws('|', 'cs', CAST(s AS VARCHAR), term)) AS md
       |        FROM counts, (SELECT unnest(range(0, $CsRows)) AS s))),
       |sketch AS MATERIALIZED (
       |  SELECT r, b, CAST(sum(sgn * c) AS BIGINT) AS sv FROM hb GROUP BY r, b),
       |top AS (SELECT term FROM counts ORDER BY c DESC, term LIMIT $CsTopK),
       |est AS (
       |  SELECT h.term, h.c, h.r, h.sgn * s.sv AS est
       |  FROM hb h JOIN top USING (term) JOIN sketch s ON s.r = h.r AND s.b = h.b),
       |med AS (
       |  SELECT term, c, est,
       |         row_number() OVER (PARTITION BY term ORDER BY est, r) AS rn
       |  FROM est)
       |SELECT term, c, est AS est_med, abs(est - c) AS abs_err
       |FROM med WHERE rn = ${(CsRows + 1) / 2}
       |ORDER BY c DESC, term""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x256_priority_sample",
      "priority sampling with per-source subset-sum estimate audit",
      prioritySample, Some(prioritySampleOracle)),
    QueryDef("x257_hrw_rebalance",
      "rendezvous-hash 16->17 shard rebalance audit vs mod-hashing",
      hrwRebalance, Some(hrwRebalanceOracle)),
    QueryDef("x258_count_sketch",
      "Count-Sketch signed heavy-hitter estimates vs exact counts",
      countSketch, Some(countSketchOracle)))
}
