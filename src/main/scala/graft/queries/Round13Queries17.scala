package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 seventeenth tier: intermittent-demand forecasting and bitmap
  * index layout — Croston's method (the standard forecaster when most
  * periods have ZERO demand, where Holt/HW degenerate; pairs with
  * x317/x343) and Roaring-bitmap container sizing (array vs bitmap vs
  * run containers per 2¹⁶ row-id chunk — the bitmap-index companion to
  * x338's column-encoding advisor).
  */
object Round13Queries17 {

  /** The fixed part panel whose demand series Croston tracks (sparse,
    * genuinely intermittent at small SF). */
  private val CrostonParts = Seq(1L, 2L, 3L, 4L, 5L)

  // ---------------------------------------------------------------- x347

  /** x347: Croston's method over each panel part's weekly demand —
    * TWO coupled exponential smoothers (α = ½), one over the NONZERO
    * demand sizes, one over the inter-demand intervals, updated only
    * when demand occurs (zero weeks never touch the state — that is the
    * method's whole point, and why no zero-fill of the week frame is
    * needed). zₜ = (q + z) quot 2, pₜ = (a + p) quot 2 with truncating
    * division (x317 convention); init z₁ = q₁, p₁ = a₁ with the first
    * interval pinned to 1. The per-period forecast z/p is micro-quantized
    * with truncating DIV. Typed groupByKey fold vs recursive-CTE oracle.
    *
    * Scale: the corpus pass is one filtered map-side-combinable
    * groupBy(part, week); the fold walks each part's NONZERO weeks
    * (bounded by the calendar, and sparse by construction). */
  def croston(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekly = Tables.lineitem(spark, dir)
      .filter($"l_partkey".isin(CrostonParts: _*))
      .select($"l_partkey".cast("long").as("pk"),
        expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7").as("wk"),
        $"l_quantity".cast("long").as("q"))
      .groupBy($"pk", $"wk").agg(sum($"q").as("q"))
    weekly.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (pk, it) =>
        val xs = it.toArray.sortBy(_._2)
        var z = xs.head._3
        var p = 1L
        var prevWk = xs.head._2
        xs.tail.foreach { case (_, wk, q) =>
          val a = wk - prevWk
          z = (q + z) / 2L
          p = (a + p) / 2L
          prevWk = wk
        }
        val fMicro = if (p > 0) z * 1000000L / p else 0L
        (pk, xs.length.toLong, z, p, fMicro)
      }
      .toDF("pk", "n_demands", "z_level", "p_interval", "f_micro")
      .orderBy($"pk")
  }

  private val crostonOracle = {
    val parts = CrostonParts.mkString(", ")
    s"""WITH RECURSIVE weekly AS MATERIALIZED (
       |  SELECT CAST(l_partkey AS BIGINT) AS pk,
       |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) // 7 AS wk,
       |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem WHERE l_partkey IN ($parts)
       |  GROUP BY 1, 2),
       |seq AS MATERIALIZED (
       |  SELECT pk, wk, q,
       |         CAST(row_number() OVER (PARTITION BY pk ORDER BY wk) AS BIGINT) AS i,
       |         lag(wk) OVER (PARTITION BY pk ORDER BY wk) AS prev_wk
       |  FROM weekly),
       |rec AS (
       |  SELECT pk, i, q AS z, CAST(1 AS BIGINT) AS p
       |  FROM seq WHERE i = 1
       |  UNION ALL
       |  SELECT s.pk, s.i,
       |         (s.q + r.z) // 2 AS z,
       |         ((s.wk - s.prev_wk) + r.p) // 2 AS p
       |  FROM rec r JOIN seq s ON s.pk = r.pk AND s.i = r.i + 1),
       |n AS (SELECT pk, max(i) AS nn FROM seq GROUP BY 1)
       |SELECT r.pk, n.nn AS n_demands, r.z AS z_level, r.p AS p_interval,
       |       CASE WHEN r.p > 0 THEN (r.z * 1000000) // r.p ELSE 0 END AS f_micro
       |FROM rec r JOIN n ON n.pk = r.pk AND r.i = n.nn
       |ORDER BY r.pk""".stripMargin
  }

  // ---------------------------------------------------------------- x348

  /** Roaring container capacity (row-ids per container). */
  private val RoaringBits = 65536L
  /** Array-container threshold: above this cardinality a bitmap wins. */
  private val ArrayMax = 4096L

  /** x348: Roaring-bitmap container sizing for the returned-items
    * (l_returnflag = 'R') row-id set. Row-ids come from a TOTAL order
    * (orderkey, linenumber, returnflag — the flag closes the fixture's
    * duplicate key pairs so the selected row-id SET is deterministic);
    * each 2¹⁶-id container then gets the classic Roaring choice: array
    * (2n + 8 bytes) when n ≤ 4096, bitmap (8192 + 8) above, run
    * container (8 + 4·runs) whenever it beats both. Run counts use the
    * in-container lag on consecutive row-ids. Everything BIGINT.
    *
    * Scale: one global sort for the row-id assignment is the honest
    * cost of positional bitmap indexes (writers do it once); containers
    * then partition the window work. Output is |rows|/2¹⁶ rows. */
  def roaringSizing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // distributed global rank: a bare Window.orderBy row_number over the
    // whole fact table runs on ONE partition (7.2 s at sf1, and a
    // non-starter at 100 TB). Two levels instead: per-orderkey ranks are
    // partitioned windows (parallel), and the orderkey PREFIX offsets
    // come from a window over the orders-grain census — same rid values,
    // distributed plan.
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag")
    val offsets = li.groupBy($"l_orderkey").agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum($"cnt").over(Window.orderBy($"l_orderkey")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"l_orderkey", $"off")
    val ids = li
      .withColumn("rn", row_number().over(Window.partitionBy($"l_orderkey")
        .orderBy($"l_linenumber", $"l_returnflag")).cast("long"))
      .join(offsets, "l_orderkey")
      .withColumn("rid", $"off" + $"rn" - 1L)
      .filter($"l_returnflag" === "R")
      .select($"rid", expr(s"rid DIV $RoaringBits").as("cont"))
    val wLag = Window.partitionBy($"cont").orderBy($"rid")
    val runs = ids
      .withColumn("brk",
        when(lag($"rid", 1).over(wLag).isNull ||
          lag($"rid", 1).over(wLag) =!= $"rid" - 1L, 1L).otherwise(0L))
      .groupBy($"cont").agg(count(lit(1)).as("n"), sum($"brk").as("runs"))
    runs
      .withColumn("array_b", when($"n" <= ArrayMax, lit(2L) * $"n" + 8L))
      .withColumn("bitmap_b", lit(RoaringBits / 8 + 8))
      .withColumn("run_b", lit(8L) + lit(4L) * $"runs")
      .select($"cont", $"n", $"runs",
        coalesce($"array_b", lit(Long.MaxValue)).as("array_b0"),
        $"bitmap_b", $"run_b")
      .withColumn("best_b", least($"array_b0", $"bitmap_b", $"run_b"))
      .select($"cont", $"n", $"runs",
        when($"array_b0" === lit(Long.MaxValue), -1L).otherwise($"array_b0").as("array_b"),
        $"bitmap_b", $"run_b", $"best_b",
        when($"run_b" === $"best_b", "run")
          .when($"array_b0" === $"best_b", "array").otherwise("bitmap").as("ctype"))
      .orderBy($"cont")
  }

  private val roaringSizingOracle =
    s"""WITH ids AS MATERIALIZED (
       |  SELECT rid, rid // $RoaringBits AS cont
       |  FROM (
       |    SELECT CAST(row_number() OVER (
       |             ORDER BY l_orderkey, l_linenumber, l_returnflag) AS BIGINT) - 1 AS rid,
       |           l_returnflag
       |    FROM lineitem)
       |  WHERE l_returnflag = 'R'),
       |runs AS (
       |  SELECT cont, CAST(count(*) AS BIGINT) AS n, CAST(sum(brk) AS BIGINT) AS runs
       |  FROM (
       |    SELECT cont, rid,
       |           CASE WHEN lag(rid) OVER (PARTITION BY cont ORDER BY rid)
       |                     IS DISTINCT FROM rid - 1 THEN 1 ELSE 0 END AS brk
       |    FROM ids)
       |  GROUP BY 1),
       |sized AS (
       |  SELECT cont, n, runs,
       |         CASE WHEN n <= $ArrayMax THEN 2 * n + 8
       |              ELSE ${Long.MaxValue} END AS array_b0,
       |         CAST(${RoaringBits / 8 + 8} AS BIGINT) AS bitmap_b,
       |         8 + 4 * runs AS run_b
       |  FROM runs),
       |best AS (
       |  SELECT *, least(array_b0, bitmap_b, run_b) AS best_b FROM sized)
       |SELECT cont, n, runs,
       |       CASE WHEN array_b0 = ${Long.MaxValue} THEN -1 ELSE array_b0 END AS array_b,
       |       bitmap_b, run_b, best_b,
       |       CASE WHEN run_b = best_b THEN 'run'
       |            WHEN array_b0 = best_b THEN 'array' ELSE 'bitmap' END AS ctype
       |FROM best ORDER BY cont""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x347_croston",
      "Croston's intermittent-demand forecast: coupled size/interval integer smoothers updated only on nonzero demand",
      croston, Some(crostonOracle)),
    QueryDef("x348_roaring_sizing",
      "Roaring-bitmap container sizing of the returns row-id set: array/bitmap/run choice per 2^16 chunk, exact run censuses",
      roaringSizing, Some(roaringSizingOracle)))
}
