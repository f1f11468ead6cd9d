package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 thirtieth tier: top-k as a real AGGREGATE — the
  * TypedImperativeAggregate `topk_pairs` (functions/TopKAggregate)
  * exercised against the window-function formulation it replaces. */
object Round10Queries30 {

  /** x192: grouped top-k via the bounded-buffer aggregate. The window
    * formulation (`row_number() OVER (PARTITION BY g ORDER BY v DESC)`
    * then `rk <= k`) shuffles EVERY row to its group's partition and
    * sorts it, just to throw all but k away; `topk_pairs` is a
    * TypedImperativeAggregate, so each map task ships at most k pairs
    * per group into the exchange (ObjectHashAggregate partial → final,
    * plan-asserted in OperatorsSpec) — the same contract as a partial
    * sum, which is what makes grouped top-k tractable at 100 TB. Ties
    * are impossible by construction (id is unique and the buffer's
    * total order is v DESC, id ASC), so the result is deterministic
    * under any merge order; the oracle recomputes it with the window
    * formulation in DuckDB.
    *
    * Scale: exchange volume is groups × k rows, independent of input
    * size — vs the window's full-input shuffle + sort. */
  def topkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderpriority".as("pri"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
        $"o_orderkey".cast("long").as("k"))
      .groupBy($"pri")
      .agg(expr("topk_pairs(cents, k, 3)").as("top"))
      .select($"pri", posexplode($"top"))
      .select($"pri", ($"pos" + 1).as("rk"),
        $"col.id".as("o_orderkey"), $"col.v".as("cents"))
      .orderBy($"pri", $"rk")
  }

  private val topkOracle =
    """SELECT pri, CAST(rk AS INTEGER) AS rk, o_orderkey, cents FROM (
      |  SELECT o_orderpriority AS pri,
      |         CAST(o_orderkey AS BIGINT) AS o_orderkey,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |         row_number() OVER (
      |           PARTITION BY o_orderpriority
      |           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
      |                    o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY pri, rk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x192_topk_agg",
      "grouped top-k via the TypedImperativeAggregate bounded buffer (map-side k pairs per group) vs the window oracle",
      topkAgg, Some(topkOracle)))
}
