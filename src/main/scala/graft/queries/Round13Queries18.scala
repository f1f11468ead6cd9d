package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 eighteenth tier: the streaming twin of the Page–Hinkley
  * detector (x341's all-BIGINT state folded through transformWithState —
  * proving the drift monitor actually RUNS as a stream, not just as a
  * batch window) and the Bloom-filter sizing planner (the (bits/key, k)
  * decision behind x153's runtime bloom joins, log-free via a literal
  * FPP table — the x87 convention).
  */
object Round13Queries18 {

  /** Same δ as batch x341 (micro-units). */
  private val PhDeltaMicro = 2000000L
  /** Same λ as batch x341 (micro-units). */
  private val PhLambdaMicro = 50000000L
  /** Chronological slice cuts (epoch days inside the fixture's Jan-2024
    * span) — slices split the DAY CENSUS, never a day, so the streaming
    * fold sees each day exactly once. */
  private val PhSliceCuts = Seq(19733L, 19743L)

  // ---------------------------------------------------------------- x349

  /** x349: streaming Page–Hinkley parity — the day census streams in
    * three chronological file slices through
    * [[graft.streaming.IncrementalStream.TwsPageHinkleyProcessor]]
    * (ValueState carrying (t, Σx, m, min m)); every emitted per-day PH
    * point must be bit-identical to the batch x341 trajectory, which the
    * oracle recomputes directly from the full series. This is the
    * operational claim behind x341's "stream-replayable" design: the
    * integer detector state crosses micro-batch (and by extension
    * checkpoint) boundaries losslessly.
    *
    * Scale: state is 4 longs TOTAL (one global key — drift detection is
    * a per-metric singleton, not per-entity); per-batch work is the
    * batch's own day rows. */
  def streamPageHinkley(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x349").toString
    val daily = Tables.events(spark, dir)
      .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("x"))
      .select(lit(0L).as("k"), $"day", $"x")
    val bounds = (Long.MinValue +: PhSliceCuts) zip (PhSliceCuts :+ Long.MaxValue)
    // r16: snapshot once — slices filter the checkpoint, not a re-aggregation
    val snap = daily.localCheckpoint(true)
    QueryUtil.stageFrames(
      bounds.map { case (lo, hi) => snap.filter($"day" >= lo && $"day" < hi) },
      s"$base/src")
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val points = graft.streaming.IncrementalStream.twsPageHinkley(
      stream.select($"k", $"day", $"x").as[(Long, Long, Long)], PhDeltaMicro)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, points.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    emitted.select($"day", $"x", $"m_t", $"ph",
      when($"ph" > PhLambdaMicro, 1L).otherwise(0L).as("alarm"))
      .orderBy($"day")
  }

  private val streamPageHinkleyOracle =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |         CAST(count(*) AS BIGINT) AS x
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
       |  FROM acc)
       |SELECT day, x, m_t, ph,
       |       CAST(CASE WHEN ph > $PhLambdaMicro THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM ph ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- x350

  /** The classic Bloom configurations: (bits/key, optimal k = ⌈b·ln2⌋,
    * FPP in ppm) — precomputed constants (fpp = (1−e^(−k/b))^k), so the
    * planner is log-free at query time (x87 literal-table convention). */
  private val BloomConfigs = Seq(
    (8L, 6L, 21577L), (10L, 7L, 8194L), (12L, 8L, 3142L),
    (14L, 10L, 1201L), (16L, 11L, 459L), (20L, 14L, 67L))
  /** Target false-positive rate (ppm): 1 %. */
  private val BloomTargetPpm = 10000L

  /** x350: Bloom-filter sizing planner for three join-key sets (parts,
    * suppliers, customers-of-orders): exact NDV per key set, then the
    * CHEAPEST configuration from the literal table meeting the 1 % FPP
    * target, with the resulting filter size in bytes ((n·b + 7) DIV 8).
    * The pick is a deterministic argmin over the config table (smallest
    * bits/key meeting target; the table is monotone so ties cannot
    * occur). Everything BIGINT.
    *
    * Scale: three map-side-combinable distinct-counts; the planner
    * algebra is a |keysets| × |configs| literal join. */
  def bloomPlanner(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val keysets =
      li.select(lit("partkey").as("keyset"), $"l_partkey".cast("long").as("k")).distinct()
        .unionByName(li.select(lit("suppkey").as("keyset"), $"l_suppkey".cast("long").as("k")).distinct())
        .unionByName(Tables.orders(spark, dir)
          .select(lit("custkey").as("keyset"), $"o_custkey".cast("long").as("k")).distinct())
        .groupBy($"keyset").agg(count(lit(1)).as("n"))
    val cfg = BloomConfigs.toDF("b", "kh", "fpp_ppm")
    keysets.crossJoin(broadcast(cfg))
      .filter($"fpp_ppm" <= BloomTargetPpm)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"keyset").orderBy($"b")))
      .filter($"rn" === 1)
      .select($"keyset", $"n", $"b", $"kh", $"fpp_ppm",
        expr("(n * b + 7) DIV 8").as("filter_bytes"))
      .orderBy($"keyset")
  }

  private val bloomPlannerOracle = {
    val cfgRows = BloomConfigs.map { case (b, k, f) => s"($b, $k, $f)" }.mkString(", ")
    s"""WITH keysets AS (
       |  SELECT keyset, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT DISTINCT 'partkey' AS keyset, l_partkey AS k FROM lineitem
       |    UNION ALL
       |    SELECT DISTINCT 'suppkey' AS keyset, l_suppkey AS k FROM lineitem
       |    UNION ALL
       |    SELECT DISTINCT 'custkey' AS keyset, o_custkey AS k FROM orders)
       |  GROUP BY 1),
       |cfg AS (SELECT CAST(b AS BIGINT) AS b, CAST(kh AS BIGINT) AS kh,
       |               CAST(fpp_ppm AS BIGINT) AS fpp_ppm
       |        FROM (VALUES $cfgRows) c(b, kh, fpp_ppm)),
       |ranked AS (
       |  SELECT k.keyset, k.n, c.b, c.kh, c.fpp_ppm,
       |         row_number() OVER (PARTITION BY k.keyset ORDER BY c.b) AS rn
       |  FROM keysets k CROSS JOIN cfg c
       |  WHERE c.fpp_ppm <= $BloomTargetPpm)
       |SELECT keyset, n, b, kh, fpp_ppm, (n * b + 7) // 8 AS filter_bytes
       |FROM ranked WHERE rn = 1
       |ORDER BY keyset""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x349_stream_page_hinkley",
      "streaming Page-Hinkley parity: the x341 BIGINT detector state folded through transformWithState across chronological slices",
      streamPageHinkley, Some(streamPageHinkleyOracle)),
    QueryDef("x350_bloom_planner",
      "Bloom-filter sizing planner: exact key-set NDV x literal (bits/key, k, fpp) table, cheapest config meeting 1% FPP",
      bloomPlanner, Some(bloomPlannerOracle)))
}
