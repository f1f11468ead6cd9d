package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
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

  /** Staleness bound for x103 (days). */
  private val AsofTolDays = 30

  /** x103: TOLERANCE-BOUNDED as-of join — the variant every point-in-time
    * feature store actually ships: a prior quote older than
    * [[AsofTolDays]] days is too stale to use, so the match nulls out.
    * Correctness rides on a monotonicity fact: the as-of match IS the
    * nearest prior, so if it misses the window every prior does — one
    * CASE after the x60 carry-forward implements "match within tolerance"
    * exactly, with no second join. Same single-shuffle scale shape as
    * x60; the tolerance is a post-window integer date predicate. */
  def asofTolerance(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val quotes = ord.groupBy($"o_custkey", $"o_orderdate")
      .agg(round(max($"o_totalprice"), 2).as("mp"))
      .select($"o_custkey", $"o_orderdate".as("q_date"), $"mp")
    val inTol = datediff($"o_orderdate", $"asof_ts") <= AsofTolDays
    AsOf.joinPrior(
      ord.select($"o_orderkey", $"o_custkey", $"o_orderdate"),
      quotes, "o_custkey", "o_orderdate", "q_date", Seq("mp"))
      .select(
        $"o_orderkey", $"o_custkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("d0"),
        when(inTol, date_format($"asof_ts", "yyyy-MM-dd")).as("prev_date"),
        when(inTol, $"asof_mp").as("prev_price"),
        coalesce(inTol, lit(false)).as("fresh"))
      .orderBy("o_orderkey")
  }

  private val asofToleranceOracle =
    s"""WITH quotes AS (SELECT o_custkey, o_orderdate AS q_date, round(max(o_totalprice), 2) AS mp
       |                FROM orders GROUP BY 1, 2)
       |SELECT o.o_orderkey, o.o_custkey,
       |       strftime(o.o_orderdate, '%Y-%m-%d') AS d0,
       |       CASE WHEN date_diff('day', q.q_date, o.o_orderdate) <= $AsofTolDays
       |            THEN strftime(q.q_date, '%Y-%m-%d') END AS prev_date,
       |       CASE WHEN date_diff('day', q.q_date, o.o_orderdate) <= $AsofTolDays
       |            THEN q.mp END AS prev_price,
       |       coalesce(date_diff('day', q.q_date, o.o_orderdate) <= $AsofTolDays, false) AS fresh
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

  /** x62: interval OVERLAP join — which users' activity sessions were
    * concurrent, and for how long. Sessions are q22's 30-minute-gap
    * intervals [min ts, max ts] per (user, session); overlapping pairs
    * across users (ua < ub) come from the banded
    * [[RangeJoin.intervalOverlap]] (1-hour bands, responsibility-band
    * dedup), aggregated to per-user-pair counts and total overlap
    * seconds. The DuckDB oracle runs the same pairing as a native
    * inequality join (IEJoin) — independent algorithms, same pairs. */
  def sessionOverlap(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sec = unix_timestamp($"ts".cast("timestamp"))
    val flagged = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id",
        when(unix_timestamp($"ts".cast("timestamp")) - unix_timestamp(lag($"ts", 1).over(w).cast("timestamp")) > 1800, 1)
          .otherwise(0).as("brk"))
      .withColumn("sess", sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val iv = flagged.groupBy($"user_id", $"sess")
      .agg(min(sec).as("s"), max(sec).as("e"))
    val a = iv.select($"user_id".as("ua"), $"s".as("as_s"), $"e".as("as_e"))
    val b = iv.select($"user_id".as("ub"), $"s".as("bs_s"), $"e".as("bs_e"))
    RangeJoin.intervalOverlap(a, b, "as_s", "as_e", "bs_s", "bs_e",
        bandSec = 3600L, extraCond = col("ua") < col("ub"))
      .select($"ua", $"ub",
        (least($"as_e", $"bs_e") - greatest($"as_s", $"bs_s")).as("ov"))
      .groupBy($"ua", $"ub")
      .agg(count(lit(1)).as("n_overlaps"), sum($"ov").as("overlap_sec"))
      .orderBy("ua", "ub")
  }

  private val overlapOracle =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |                   - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM flagged),
      |iv AS (SELECT user_id, sess, min(sec) AS s, max(sec) AS e
      |       FROM sess GROUP BY user_id, sess),
      |p AS (SELECT a.user_id AS ua, b.user_id AS ub,
      |        least(a.e, b.e) - greatest(a.s, b.s) AS ov
      |      FROM iv a JOIN iv b
      |        ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e)
      |SELECT ua, ub, count(*) AS n_overlaps, CAST(sum(ov) AS BIGINT) AS overlap_sec
      |FROM p GROUP BY ua, ub
      |ORDER BY ua, ub""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x60_asof_join", "as-of join (point-in-time prior-order lookup) vs native DuckDB ASOF", asofPriorOrder, Some(asofOracle)),
    QueryDef("x103_asof_tolerance", "tolerance-bounded as-of join: nearest prior only within a staleness window", asofTolerance, Some(asofToleranceOracle)),
    QueryDef("x61_range_join", "banded interval self-join (pairs within 300s) vs inequality join", rangePairs, Some(rangeOracle)),
    QueryDef("x62_interval_overlap", "interval x interval overlap join (concurrent sessions) vs native IEJoin", sessionOverlap, Some(overlapOracle)))
}
