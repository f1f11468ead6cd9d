package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 eleventh tier: materialized-view selection over the cube
  * lattice — the greedy algorithm of Harinarayan, Rajaraman & Ullman
  * ("Implementing Data Cubes Efficiently", SIGMOD 1996), the classic
  * OLAP answer to "which k cuboids should we precompute?". The lattice
  * is the 2³ subsets of (returnflag, linestatus, shipyear); every view's
  * exact row count derives from ONE corpus pass (the base cuboid), and
  * the greedy rounds run as pure integer algebra on the 8-row lattice
  * frame, unrolled identically in both engines.
  */
object Round13Queries11 {

  /** Greedy rounds (views selected beyond the always-materialized top). */
  private val GreedyK = 3

  /** x337: HRU greedy view selection. Views are 3-bit masks (1 = flag,
    * 2 = status, 4 = year); |view| = distinct masked tuples of the
    * ≤ 42-row base cuboid, so all eight sizes cost one corpus scan.
    * cost(w) = size of the smallest materialized ancestor (w ⊆ v ⟺
    * w & v = w); benefit(v) = Σ_{w ⊆ v} max(0, cost(w) − |v|). Each
    * round picks the max-benefit unpicked view (ties → lowest mask,
    * deterministic), updates every descendant's cost, and reports the
    * pick plus the lattice's total query cost after the pick — the
    * monotone trace the HRU paper's 0.63-approximation guarantee is
    * stated over. All counts/benefits BIGINT; no doubles anywhere.
    *
    * Scale: the corpus pass is a map-side-combinable distinct on three
    * low-cardinality dims; the lattice algebra is 8×8 joins on
    * broadcast-sized frames, checkpointed per round so the plan stays
    * bounded. At 100 TB the base cuboid is still ≤ |domain product|
    * rows — the whole point of lattice-based view selection. */
  def viewSelection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("f"), $"l_linestatus".as("s"),
        year($"l_shipdate").cast("long").as("y"))
      .distinct()
    val masks = (0L to 7L).toDF("mask")
    val sizes = base.crossJoin(masks)
      .select($"mask",
        when($"mask".bitwiseAND(lit(1L)) === 1L, $"f").as("mf"),
        when($"mask".bitwiseAND(lit(2L)) === 2L, $"s").as("ms"),
        when($"mask".bitwiseAND(lit(4L)) === 4L, $"y").as("my"))
      .distinct()
      .groupBy($"mask").agg(count(lit(1)).as("vrows"))
    val top = sizes.filter($"mask" === 7L).select($"vrows".as("s7"))
    var state = sizes.crossJoin(broadcast(top))
      .select($"mask", $"vrows", $"s7".as("cost"), ($"mask" === 7L).as("picked"))
      .localCheckpoint(true)
    var out: DataFrame = null
    (1 to GreedyK).foreach { i =>
      val ben = state.filter(!$"picked").as("v")
        .join(state.as("c"), expr("(c.mask & v.mask) = c.mask"))
        .groupBy(col("v.mask").as("vmask"), col("v.vrows").as("vsize"))
        .agg(sum(greatest(lit(0L), col("c.cost") - col("v.vrows"))).as("benefit"))
      val pick = ben
        .withColumn("rn", row_number().over(Window.orderBy($"benefit".desc, $"vmask")))
        .filter($"rn" === 1).select($"vmask", $"vsize", $"benefit")
      state = state.crossJoin(broadcast(pick))
        .select($"mask", $"vrows",
          when(($"mask".bitwiseAND($"vmask")) === $"mask" && $"vsize" < $"cost", $"vsize")
            .otherwise($"cost").as("cost"),
          ($"picked" || ($"mask" === $"vmask")).as("picked"))
        .localCheckpoint(true)
      val tot = state.agg(sum($"cost").as("total_cost"))
      val row = pick.crossJoin(broadcast(tot))
        .select(lit(i.toLong).as("iter"), $"vmask".as("mask"),
          $"vsize".as("view_rows"), $"benefit", $"total_cost")
      out = if (out == null) row else out.unionByName(row)
    }
    out.orderBy($"iter")
  }

  private val viewSelectionOracle = {
    val rounds = (1 to GreedyK).map { i =>
      val prev = s"state${i - 1}"
      s"""ben$i AS (
         |  SELECT v.mask AS vmask, v.vrows AS vsize,
         |         CAST(sum(greatest(0, c.cost - v.vrows)) AS BIGINT) AS benefit
         |  FROM $prev v JOIN $prev c ON (c.mask & v.mask) = c.mask
         |  WHERE NOT v.picked GROUP BY 1, 2),
         |pick$i AS (SELECT * FROM ben$i ORDER BY benefit DESC, vmask LIMIT 1),
         |state$i AS (
         |  SELECT s.mask, s.vrows,
         |         CASE WHEN (s.mask & p.vmask) = s.mask AND p.vsize < s.cost
         |              THEN p.vsize ELSE s.cost END AS cost,
         |         s.picked OR s.mask = p.vmask AS picked
         |  FROM $prev s CROSS JOIN pick$i p),
         |tot$i AS (SELECT CAST(sum(cost) AS BIGINT) AS total_cost FROM state$i)""".stripMargin
    }.mkString(",\n")
    val selects = (1 to GreedyK).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS iter, CAST(vmask AS BIGINT) AS mask,
         |       vsize AS view_rows, benefit,
         |       (SELECT total_cost FROM tot$i) AS total_cost
         |FROM pick$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS MATERIALIZED (
       |  SELECT DISTINCT l_returnflag AS f, l_linestatus AS s,
       |         CAST(year(l_shipdate) AS BIGINT) AS y
       |  FROM lineitem),
       |masks AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) m(mask)),
       |proj AS (
       |  SELECT DISTINCT mask,
       |         CASE WHEN mask & 1 = 1 THEN f END AS mf,
       |         CASE WHEN mask & 2 = 2 THEN s END AS ms,
       |         CASE WHEN mask & 4 = 4 THEN y END AS my
       |  FROM base CROSS JOIN masks),
       |sizes AS (SELECT mask, CAST(count(*) AS BIGINT) AS vrows FROM proj GROUP BY 1),
       |state0 AS (
       |  SELECT mask, vrows, (SELECT vrows FROM sizes WHERE mask = 7) AS cost,
       |         mask = 7 AS picked
       |  FROM sizes),
       |$rounds
       |$selects
       |ORDER BY iter""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x337_view_selection",
      "HRU greedy cube-lattice view selection (SIGMOD'96): exact cuboid sizes from one scan, unrolled integer greedy rounds",
      viewSelection, Some(viewSelectionOracle)))
}
