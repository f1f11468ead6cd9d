package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: AS-OF (point-in-time
  * lookup, union+carry-forward implementation) and banded range join.
  * DuckDB oracles use its native ASOF JOIN / inequality join — strong
  * cross-checks since the implementations share nothing. */
object JoinOpQueries {

  /** AS-OF: each order gets the customer's most recent strictly-earlier
    * order date + (deduped) price. Right side pre-aggregated per
    * (custkey, date) so the match is deterministic. */
  def asofPriorOrder(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val quotes = ord.groupBy($"o_custkey", $"o_orderdate")
      .agg(round(max($"o_totalprice"), 2).as("mp"))
      .select($"o_custkey", $"o_orderdate".as("q_date"), $"mp")
    AsOf.joinPrior(
      ord.select($"o_orderkey", $"o_custkey", $"o_orderdate"),
      quotes, "o_custkey", "o_orderdate", "q_date", Seq("mp"))
      .select(
        $"o_orderkey", $"o_custkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("d0"),
        date_format($"asof_ts", "yyyy-MM-dd").as("prev_date"),
        $"asof_mp".as("prev_price"))
      .orderBy("o_orderkey")
  }

  private val asofOracle =
    """WITH quotes AS (SELECT o_custkey, o_orderdate AS q_date, round(max(o_totalprice), 2) AS mp
      |                FROM orders GROUP BY 1, 2)
      |SELECT o.o_orderkey, o.o_custkey,
      |       strftime(o.o_orderdate, '%Y-%m-%d') AS d0,
      |       strftime(q.q_date, '%Y-%m-%d') AS prev_date,
      |       q.mp AS prev_price
      |FROM orders o ASOF LEFT JOIN quotes q
      |  ON o.o_custkey = q.o_custkey AND o.o_orderdate > q.q_date
      |ORDER BY o.o_orderkey""".stripMargin

  /** Range join: per user, pairs of events where the later-id event falls
    * 0–300 s after the earlier-id one — banded equi-join, not an O(n²)
    * inequality join. */
  def rangePairs(spark: SparkSession, dir: String) = {
    import spark.implicits._
    RangeJoin.withinInterval(Tables.events(spark, dir), "user_id", "event_id", "ts", 300L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"), min($"gap_sec").as("min_gap"))
      .orderBy("user_id")
  }

  private val rangeOracle =
    """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      |SELECT a.user_id, count(*) AS n_pairs, min(b.sec - a.sec) AS min_gap
      |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND b.sec - a.sec BETWEEN 0 AND 300
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x60_asof_join", "as-of join (point-in-time prior-order lookup) vs native DuckDB ASOF", asofPriorOrder, Some(asofOracle)),
    QueryDef("x61_range_join", "banded interval self-join (pairs within 300s) vs inequality join", rangePairs, Some(rangeOracle)))
}
