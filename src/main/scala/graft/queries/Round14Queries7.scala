package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 wave 7: sequential experimentation + forecast-quality
  * decomposition — Wald's SPRT over event streams (batch x373, streaming
  * twin x375 through transformWithState ValueState) and the Murphy
  * decomposition of the Brier score (x374), all exact-integer /
  * fixed-point so both engines agree bit-for-bit. */
object Round14Queries7 {

  /** SPRT constants, 1e-6 fixed point: testing Bernoulli p1=0.6 vs
    * p0=0.4. Per-observation LLR = ±ln(1.5); boundaries ±ln((1-β)/α)
    * with α=β=0.05 → ±ln 19. Literal integers, so the random walk is
    * exact BIGINT arithmetic in both engines. */
  private val StepFp = 405465L      // floor(ln(1.5) * 1e6 + 0.5)
  private val BoundFp = 2944439L    // floor(ln(19) * 1e6 + 0.5)
  /** Success threshold on `value` (median ≈ 35.7, so p sits near 0.5 and
    * the walk genuinely wanders before deciding). */
  private val SprtThresh = 35.0

  /** x373: Wald SPRT boundary audit — per event type, walk the events in
    * (ts, event_id) order, add ±ln(1.5) per observation (value >= 35 is
    * a success), and report the FIRST boundary crossing: accept_h1 at
    * +ln 19, accept_h0 at −ln 19, else `continue` with the final state.
    * The sequential-testing primitive an experimentation platform runs
    * instead of fixed-horizon tests; one window cumsum + one argmin, no
    * iterative pass. */
  def sprtBoundary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"sec", $"event_id")
    val walk = Tables.events(spark, dir)
      .select($"event_type", $"event_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        when($"value" >= SprtThresh, lit(StepFp)).otherwise(lit(-StepFp)).as("step"))
      .withColumn("n", row_number().over(w))
      .withColumn("llr", sum($"step").over(w))
      .localCheckpoint(true) // three consumers (crossed, totals, llr join)
    val crossed = walk.filter(abs($"llr") >= BoundFp)
      .groupBy($"event_type").agg(min($"n").as("n_dec"))
    val tot = walk.groupBy($"event_type")
      .agg(max($"n").as("n_total"), max(struct($"n", $"llr")).as("fin"))
      .select($"event_type", $"n_total", $"fin.llr".as("llr_final"))
    tot.join(crossed, Seq("event_type"), "left")
      .join(walk.select($"event_type", $"n".as("n_dec"), $"llr".as("llr_dec")),
        Seq("event_type", "n_dec"), "left")
      .select($"event_type",
        when($"n_dec".isNull, "continue")
          .when($"llr_dec" >= BoundFp, "accept_h1")
          .otherwise("accept_h0").as("decision"),
        coalesce($"n_dec", $"n_total").as("n_at_decision"),
        coalesce($"llr_dec", $"llr_final").as("llr_fp"),
        $"n_total")
      .orderBy("event_type")
  }

  private val sprtOracle =
    s"""WITH e AS (SELECT event_type, event_id,
       |             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |             CASE WHEN value >= $SprtThresh THEN $StepFp ELSE -$StepFp END AS step
       |           FROM events),
       |walk AS (SELECT event_type, event_id,
       |           row_number() OVER w AS n,
       |           sum(step) OVER w AS llr
       |         FROM e
       |         WINDOW w AS (PARTITION BY event_type ORDER BY sec, event_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |crossed AS (SELECT event_type, min(n) AS n_dec FROM walk
       |            WHERE abs(llr) >= $BoundFp GROUP BY event_type),
       |tot AS (SELECT event_type, max(n) AS n_total,
       |          max_by(llr, n) AS llr_final
       |        FROM walk GROUP BY event_type)
       |SELECT t.event_type,
       |       CASE WHEN c.n_dec IS NULL THEN 'continue'
       |            WHEN wd.llr >= $BoundFp THEN 'accept_h1'
       |            ELSE 'accept_h0' END AS decision,
       |       CAST(coalesce(c.n_dec, t.n_total) AS BIGINT) AS n_at_decision,
       |       CAST(coalesce(wd.llr, t.llr_final) AS BIGINT) AS llr_fp,
       |       CAST(t.n_total AS BIGINT) AS n_total
       |FROM tot t
       |LEFT JOIN crossed c ON c.event_type = t.event_type
       |LEFT JOIN walk wd ON wd.event_type = t.event_type AND wd.n = c.n_dec
       |ORDER BY t.event_type""".stripMargin

  /** x374 forecast bins (centers (2k+1)/20) and the outcome label. */
  private val BrierBins = 10
  private val BrierLabelChars = 300

  /** x374: Murphy decomposition of the Brier score — reliability −
    * resolution + uncertainty, the forecast-quality triple behind x166's
    * ECE: forecast = hash-assigned bin center (2k+1)/20, outcome = the
    * long-document label. Every component reduces to exact integer
    * censuses: the Brier sum is a per-row integer ((2k+1) − 20·o)²; the
    * per-bin REL/RES terms have integer numerators ((2k+1)n_k − 20p_k)²
    * and (N·p_k − P·n_k)² (BIGINT-safe to N ≈ 5e4), quantized half-up
    * 1e-9 per bin before the order-free integer sum. Emits the identity
    * residual — computed from the same doubles in both engines — as the
    * self-check column. */
  def brierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binned = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        (QueryUtil.md5Int(concat_ws("|", lit("brier"), $"doc_id"), 4) % BrierBins).as("k"),
        ($"n_chars" >= BrierLabelChars).cast("long").as("o"))
    val perBin = binned.groupBy($"k")
      .agg(count(lit(1)).as("nk"), sum($"o").as("pk"),
        sum(((lit(2) * $"k" + 1 - lit(20) * $"o")
          * (lit(2) * $"k" + 1 - lit(20) * $"o"))).as("bsum"))
    val totals = perBin.agg(
      sum($"nk").as("n"), sum($"pk").as("p"), sum($"bsum").as("bsum")).localCheckpoint(true)
    val nTot = totals.select($"n").head().getLong(0)
    val pTot = totals.select($"p").head().getLong(0)
    val relres = perBin.select(
      floor(((lit(2) * $"k" + 1) * $"nk" - lit(20) * $"pk").cast("double")
        * ((lit(2) * $"k" + 1) * $"nk" - lit(20) * $"pk").cast("double")
        / (lit(400.0) * $"nk".cast("double")) * lit(1e9) + lit(0.5))
        .cast("long").as("rel_fp"),
      floor((lit(nTot) * $"pk" - lit(pTot) * $"nk").cast("double")
        * (lit(nTot) * $"pk" - lit(pTot) * $"nk").cast("double")
        / (lit(nTot).cast("double") * lit(nTot) * $"nk".cast("double")) * lit(1e9) + lit(0.5))
        .cast("long").as("res_fp"))
      .agg(sum($"rel_fp").as("rel_fp"), sum($"res_fp").as("res_fp"))
    totals.crossJoin(relres)
      .select($"n", $"p",
        QueryUtil.halfUp($"bsum".cast("double") / (lit(400.0) * $"n"), 6).as("brier"),
        QueryUtil.halfUp($"rel_fp".cast("double") / (lit(1e9) * $"n"), 6).as("rel"),
        QueryUtil.halfUp($"res_fp".cast("double") / (lit(1e9) * $"n"), 6).as("res"),
        QueryUtil.halfUp($"p".cast("double") * ($"n" - $"p") / ($"n".cast("double") * $"n"), 6)
          .as("unc"),
        QueryUtil.halfUp(
          $"bsum".cast("double") / (lit(400.0) * $"n")
            - ($"rel_fp".cast("double") / (lit(1e9) * $"n")
              - $"res_fp".cast("double") / (lit(1e9) * $"n")
              + $"p".cast("double") * ($"n" - $"p") / ($"n".cast("double") * $"n")), 6)
          .as("identity_resid"))
  }

  private val brierOracle = {
    val h16 = QueryUtil.md5IntSql("concat_ws('|', 'brier', CAST(doc_id AS VARCHAR))", 4)
    s"""WITH b AS (SELECT doc_id,
       |             CAST($h16 % $BrierBins AS BIGINT) AS k,
       |             CASE WHEN n_chars >= $BrierLabelChars THEN 1 ELSE 0 END AS o
       |           FROM documents),
       |pb AS (SELECT k, CAST(count(*) AS BIGINT) AS nk, CAST(sum(o) AS BIGINT) AS pk,
       |         CAST(sum((2 * k + 1 - 20 * o) * (2 * k + 1 - 20 * o)) AS BIGINT) AS bsum
       |       FROM b GROUP BY k),
       |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(pk) AS BIGINT) AS p,
       |          CAST(sum(bsum) AS BIGINT) AS bsum FROM pb),
       |rr AS (SELECT
       |         CAST(sum(CAST(floor(
       |           CAST(((2 * k + 1) * nk - 20 * pk) AS DOUBLE)
       |           * CAST(((2 * k + 1) * nk - 20 * pk) AS DOUBLE)
       |           / (400.0 * CAST(nk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS rel_fp,
       |         CAST(sum(CAST(floor(
       |           CAST((tot.n * pk - tot.p * nk) AS DOUBLE)
       |           * CAST((tot.n * pk - tot.p * nk) AS DOUBLE)
       |           / (CAST(tot.n AS DOUBLE) * tot.n * CAST(nk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS res_fp
       |       FROM pb, tot)
       |SELECT tot.n, tot.p,
       |  floor(CAST(tot.bsum AS DOUBLE) / (400.0 * tot.n) * 1000000 + 0.5) / 1000000.0 AS brier,
       |  floor(CAST(rr.rel_fp AS DOUBLE) / (1e9 * tot.n) * 1000000 + 0.5) / 1000000.0 AS rel,
       |  floor(CAST(rr.res_fp AS DOUBLE) / (1e9 * tot.n) * 1000000 + 0.5) / 1000000.0 AS res,
       |  floor(CAST(tot.p AS DOUBLE) * (tot.n - tot.p) / (CAST(tot.n AS DOUBLE) * tot.n) * 1000000 + 0.5) / 1000000.0 AS unc,
       |  floor((CAST(tot.bsum AS DOUBLE) / (400.0 * tot.n)
       |         - (CAST(rr.rel_fp AS DOUBLE) / (1e9 * tot.n)
       |            - CAST(rr.res_fp AS DOUBLE) / (1e9 * tot.n)
       |            + CAST(tot.p AS DOUBLE) * (tot.n - tot.p) / (CAST(tot.n AS DOUBLE) * tot.n))) * 1000000 + 0.5) / 1000000.0 AS identity_resid
       |FROM tot, rr""".stripMargin
  }

  /** x375: the STREAMING SPRT — the same walk maintained per event type
    * in transformWithState ValueState across 3 chronological
    * micro-batches: state carries (llr, n, decided); each batch folds its
    * rows in (sec, event_id) order; the decision row is emitted exactly
    * once, in the batch whose observation crosses the boundary. Oracle =
    * the batch walk's crossings (decided types only) — batch-split
    * invariance by the same global-order argument as the session
    * processors. */
  def streamSprt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x375").toString
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"event_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        when($"value" >= SprtThresh, lit(1)).otherwise(lit(0)).as("x"))
      .localCheckpoint(true) // r16: one scan for all staged slices
    val cuts = Seq(1704800000L, 1705800000L)
    val bounds = (Long.MinValue +: cuts) zip (cuts :+ Long.MaxValue)
    QueryUtil.stageFrames(bounds.map { case (lo, hi) =>
      ev.filter($"sec" >= lo && $"sec" < hi)
    }, s"$base/src")
    val schema = StructType(Seq(StructField("event_type", StringType),
      StructField("event_id", LongType), StructField("sec", LongType),
      StructField("x", IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .as[(String, Long, Long, Int)]
    val decisions = graft.streaming.IncrementalStream.sprtStream(
      stream, StepFp, BoundFp)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, decisions.toDF(), base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy("event_type")
  }

  private val streamSprtOracle =
    s"""WITH e AS (SELECT event_type, event_id,
       |             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |             CASE WHEN value >= $SprtThresh THEN $StepFp ELSE -$StepFp END AS step
       |           FROM events),
       |walk AS (SELECT event_type,
       |           row_number() OVER w AS n,
       |           sum(step) OVER w AS llr
       |         FROM e
       |         WINDOW w AS (PARTITION BY event_type ORDER BY sec, event_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |dec AS (SELECT event_type, min(n) AS n_dec FROM walk
       |        WHERE abs(llr) >= $BoundFp GROUP BY event_type)
       |SELECT d.event_type,
       |       CASE WHEN w.llr >= $BoundFp THEN 'accept_h1' ELSE 'accept_h0' END AS decision,
       |       CAST(d.n_dec AS BIGINT) AS n_at_decision,
       |       CAST(w.llr AS BIGINT) AS llr_fp
       |FROM dec d JOIN walk w ON w.event_type = d.event_type AND w.n = d.n_dec
       |ORDER BY d.event_type""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x373_sprt_boundary",
      "Wald SPRT boundary audit per event type: exact fixed-point LLR walk, first crossing or continue (stats)",
      sprtBoundary, Some(sprtOracle)),
    QueryDef("x374_brier_decomposition",
      "Murphy decomposition of the Brier score: REL - RES + UNC from integer censuses, identity residual emitted (stats)",
      brierDecomposition, Some(brierOracle)),
    QueryDef("x375_stream_sprt",
      "streaming SPRT via transformWithState ValueState over 3 micro-batches: decision emitted exactly once at the crossing (X6)",
      streamSprt, Some(streamSprtOracle)))
}
