package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil.{halfUp, halfUp4}

/** Round-10 fourteenth tier: quantile-sketch guarantee audit (the
  * mergeable-quantile counterpart of q96's HLL bound check), CBO join-order
  * cost comparison (the decision layer on top of q94/q98's estimators),
  * and a CSV round-trip through the oracle gate (formats were spec-only). */
object Round10Queries14 {

  /** q106 audited quantiles and sketch accuracy (ε = 1/Acc). */
  private val QAcc = 1000
  private val Quants = Seq(0.25, 0.5, 0.75, 0.95)

  /** q106: percentile_approx guarantee audit — Spark's quantile sketch
    * (Greenwald–Khanna family) promises every returned element's RANK is
    * within ε·N of the target (ε = 1/accuracy). The estimate itself
    * depends on partial-merge order, so the oracle-stable output is the
    * GUARANTEE, not the value: for each q, the exact ranks
    * count(x < est) and count(x ≤ est) must bracket (q ± 3ε)·N (3× the
    * contract for merge-order headroom; the q96/q31 bounded-error
    * pattern). A sketch whose merge violated its invariant fails the
    * flag — this is the regression test a 100 TB percentile service
    * needs, where exact ranks are a luxury the audit pays once.
    *
    * Scale: one sketch pass (mergeable, O(1/ε·log εN) state per
    * partition) + one rank-audit pass with the 4 estimates broadcast. */
  def quantileSketchBound(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_totalprice")
    val ests = o.agg(percentile_approx($"o_totalprice",
        array(Quants.map(lit): _*), lit(QAcc)).as("ests"),
        count(lit(1)).as("n"))
      .select(posexplode($"ests").as(Seq("i", "est")), $"n")
    o.crossJoin(broadcast(ests))
      .groupBy($"i", $"n")
      .agg(sum(when($"o_totalprice" < $"est", 1L).otherwise(0L)).as("rank_lt"),
        sum(when($"o_totalprice" <= $"est", 1L).otherwise(0L)).as("rank_le"))
      .withColumn("q", element_at(array(Quants.map(lit): _*), ($"i" + 1).cast("int")))
      .select($"i".cast("int").as("i"), $"q", $"n",
        ($"rank_le".cast("double") >= ($"q" - 3.0 / QAcc) * $"n" &&
          $"rank_lt".cast("double") <= ($"q" + 3.0 / QAcc) * $"n")
          .cast("int").as("within_bound"))
      .orderBy("i")
  }

  private val quantileSketchBoundOracle = {
    val rows = Quants.zipWithIndex
      .map { case (q, i) => s"($i, ${q})" }.mkString(", ")
    s"""SELECT i, CAST(q AS DOUBLE) AS q,
       |       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n,
       |       1 AS within_bound
       |FROM (VALUES $rows) AS t(i, q)
       |ORDER BY i""".stripMargin
  }

  /** q107 selective dim filter (makes the two join orders genuinely
    * different in cost). */
  private val JoinSeg = "BUILDING"

  /** q107: join-order cost comparison — the DECISION layer on top of the
    * q94/q98 cardinality estimators: for the filtered 3-table chain
    * lineitem ⋈ orders ⋈ customer[mktsegment = BUILDING], cost the two
    * left-deep orders by their estimated intermediate size (the textbook
    * |A|·|B|/max(ndv) on base-table stats), measure the TRUE intermediate
    * sizes, and flag whether the estimator picks the truly cheaper order.
    * Starting from the filtered dim ((O⋈C')⋈L) should beat starting from
    * the fact join ((L⋈O)⋈C') — the exact reordering Catalyst's CBO
    * performs when stats exist; here the decision is derived from the
    * engine's OWN q93-style stats and auditable.
    *
    * Scale: estimates touch only stats aggregates; the truth pass runs
    * each intermediate once (audit-only). */
  def joinOrderCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir).select($"l_orderkey")
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val cf = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === JoinSeg).select($"c_custkey")
    val stats = l.agg(count(lit(1)).as("n_l"), countDistinct($"l_orderkey").as("ndv_l_ok"))
      .crossJoin(o.agg(count(lit(1)).as("n_o"),
        countDistinct($"o_orderkey").as("ndv_o_ok"),
        countDistinct($"o_custkey").as("ndv_o_ck")))
      .crossJoin(cf.agg(count(lit(1)).as("n_c"), countDistinct($"c_custkey").as("ndv_c_ck")))
    val trueLO = l.join(o, $"l_orderkey" === $"o_orderkey").agg(count(lit(1)).as("true_lo"))
    val trueOC = o.join(broadcast(cf), $"o_custkey" === $"c_custkey")
      .agg(count(lit(1)).as("true_oc"))
    stats.crossJoin(trueLO).crossJoin(trueOC)
      .withColumn("est_lo", $"n_l".cast("double") * $"n_o"
        / greatest($"ndv_l_ok", $"ndv_o_ok").cast("double"))
      .withColumn("est_oc", $"n_o".cast("double") * $"n_c"
        / greatest($"ndv_o_ck", $"ndv_c_ck").cast("double"))
      .selectExpr(
        """stack(2,
          |  'fact_first_LO', est_lo, CAST(true_lo AS DOUBLE),
          |  'dim_first_OC', est_oc, CAST(true_oc AS DOUBLE)) as (plan, est_inter, true_inter)""".stripMargin,
        "CAST(est_oc < est_lo AS INT) = CAST(true_oc < true_lo AS INT) as agree_raw")
      .select($"plan", halfUp($"est_inter", 2).as("est_inter"),
        $"true_inter".cast("long").as("true_inter"),
        $"agree_raw".cast("int").as("est_picks_true_winner"))
      .orderBy("plan")
  }

  private val joinOrderCostOracle =
    s"""WITH s AS (
       |  SELECT (SELECT count(*) FROM lineitem) AS n_l,
       |         (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS ndv_l_ok,
       |         (SELECT count(*) FROM orders) AS n_o,
       |         (SELECT count(DISTINCT o_orderkey) FROM orders) AS ndv_o_ok,
       |         (SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_o_ck,
       |         (SELECT count(*) FROM customer WHERE c_mktsegment = '$JoinSeg') AS n_c,
       |         (SELECT count(DISTINCT c_custkey) FROM customer
       |          WHERE c_mktsegment = '$JoinSeg') AS ndv_c_ck,
       |         (SELECT count(*) FROM lineitem JOIN orders
       |          ON l_orderkey = o_orderkey) AS true_lo,
       |         (SELECT count(*) FROM orders JOIN customer
       |          ON o_custkey = c_custkey
       |          WHERE c_mktsegment = '$JoinSeg') AS true_oc),
       |e AS (SELECT *,
       |        CAST(n_l AS DOUBLE) * n_o / CAST(greatest(ndv_l_ok, ndv_o_ok) AS DOUBLE) AS est_lo,
       |        CAST(n_o AS DOUBLE) * n_c / CAST(greatest(ndv_o_ck, ndv_c_ck) AS DOUBLE) AS est_oc
       |      FROM s)
       |SELECT t.plan,
       |       floor(t.est_inter * 100 + 0.5) / 100.0 AS est_inter,
       |       CAST(t.true_inter AS BIGINT) AS true_inter,
       |       CAST((e.est_oc < e.est_lo) = (e.true_oc < e.true_lo) AS INTEGER)
       |         AS est_picks_true_winner
       |FROM e, LATERAL (VALUES
       |  ('fact_first_LO', e.est_lo, CAST(e.true_lo AS DOUBLE)),
       |  ('dim_first_OC', e.est_oc, CAST(e.true_oc AS DOUBLE)))
       |  AS t(plan, est_inter, true_inter)
       |ORDER BY t.plan""".stripMargin

  /** x168's cohort bound. */
  private val CsvUsers = 40

  /** x168: CSV round-trip through the oracle gate — the source-format
    * path was spec-only (FormatsSpec proves ORC/CSV round-trips and parse
    * modes); this drives it through the driver's DuckDB compare: the
    * events cohort is WRITTEN as real CSV (header, explicit long/string/
    * double columns, timestamps carried as epoch micros — the lossless
    * transport convention) and READ BACK with an explicit schema (never
    * inferSchema — SURVEY §1.2's fixed-schema rule), then aggregated;
    * the oracle computes the same aggregate from the parquet table, so a
    * hash match proves the CSV transport lost nothing: longs and strings
    * exact, doubles via shortest-round-trip repr, order via the digest
    * over (sec, event_id)-sorted types.
    *
    * Scale: CSV read/write is splittable and schema-driven; the pattern
    * (explicit schema + typed epoch columns) is exactly what a 100 TB
    * CSV landing zone needs to avoid inference scans and tz drift. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x168").toString
    val ev = Tables.events(spark, dir).filter($"user_id" < CsvUsers)
      .select($"event_id", $"user_id",
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        $"event_type", $"value")
    ev.write.option("header", "true").csv(s"$base/csv")
    val schema = "event_id LONG, user_id LONG, ts_us LONG, event_type STRING, value DOUBLE"
    val back = spark.read.schema(schema).option("header", "true").csv(s"$base/csv")
    // eager localCheckpoint so the CSV staging dir can be deleted before
    // returning (no disk accumulation across runs)
    val out = back.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct($"event_id").as("n_ids"),
        sum(floor($"value" * 100 + lit(0.5)).cast("long")).as("cents"),
        sum($"ts_us" % 1000000L).as("us_sum"),
        md5(array_join(transform(
          sort_array(collect_list(struct($"ts_us", $"event_id"))),
          s => s.getField("event_id").cast("string")), ",")).as("order_md5"))
      .localCheckpoint()
    QueryUtil.deleteRecursively(base)
    out.orderBy("event_type")
  }

  private val csvRoundtripOracle =
    s"""SELECT event_type,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
       |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       |       CAST(sum(epoch_us(ts) % 1000000) AS BIGINT) AS us_sum,
       |       md5(string_agg(CAST(event_id AS VARCHAR), ','
       |           ORDER BY epoch_us(ts), event_id)) AS order_md5
       |FROM events
       |WHERE user_id < $CsvUsers
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q106_quantile_sketch_bound",
      "percentile_approx rank-guarantee audit: exact ranks of sketch outputs must bracket (q +- 3eps)N",
      quantileSketchBound, Some(quantileSketchBoundOracle)),
    QueryDef("q107_join_order_cost",
      "CBO join-order costing: stats-estimated intermediate sizes for both left-deep orders vs true sizes, winner-agreement flag",
      joinOrderCost, Some(joinOrderCostOracle)),
    QueryDef("x168_csv_roundtrip",
      "CSV transport round-trip: explicit-schema write/read of the events cohort, aggregate == parquet oracle",
      csvRoundtrip, Some(csvRoundtripOracle)))
}
