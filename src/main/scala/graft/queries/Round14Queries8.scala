package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 8: time-series linear interpolation (x376), the skyline /
  * Pareto-frontier operator (x377 — efficient windowed plan pinned against
  * a brute-force EXISTS oracle), and IPS/SNIPS off-policy evaluation
  * (x378 — the offline policy-value estimate an experimentation or
  * data-mixing loop runs before deploying a new routing policy). */
object Round14Queries8 {

  /** x376: linear interpolation over a sparse daily series — q55 gap-fills
    * by carry-forward; this reconstructs missing days by EXACT linear
    * interpolation between the bracketing observations (the resampling
    * step a forecasting pipeline runs): the daily cents series keeps only
    * every 3rd day as "observed", every calendar day in the span is
    * emitted with its observed or interpolated value, edge days outside
    * the observed hull stay null. v = v0 + (v1-v0)(t-d0)/(d1-d0) on exact
    * integers, half-up 4dp. Scale: the frame is bounded by CALENDAR DAYS
    * (not rows), so the single-series window is a constant-size tail on
    * an aggregated frame; per-key series would partition the windows. */
  def linearInterpolation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"),
        floor($"value" * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("cents"))
    val span = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val allDays = span.select(explode(sequence($"lo", $"hi")).as("day"))
    val obs = daily.filter($"day" % 3 === 0)
      .select($"day", $"cents")
    val w = Window.orderBy($"day")
    val joined = allDays.join(obs, Seq("day"), "left")
      .withColumn("d0", last(when($"cents".isNotNull, $"day"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("v0", last($"cents", ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d1", first(when($"cents".isNotNull, $"day"), ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing)))
      .withColumn("v1", first($"cents", ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing)))
    joined.select($"day",
      $"cents".isNotNull.cast("int").as("observed"),
      QueryUtil.halfUp(
        when($"cents".isNotNull, $"cents".cast("double"))
          .when($"d0".isNotNull && $"d1".isNotNull,
            $"v0" + ($"v1" - $"v0").cast("double") * ($"day" - $"d0") / ($"d1" - $"d0"))
          .otherwise(lit(null).cast("double")), 4).as("val"))
      .orderBy("day")
  }

  private val linearInterpolationOracle =
    s"""WITH daily AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |               FROM events GROUP BY 1),
       |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
       |alld AS (SELECT unnest(range(lo, hi + 1)) AS day FROM span),
       |obs AS (SELECT day, cents FROM daily WHERE day % 3 = 0),
       |j AS (SELECT a.day, o.cents,
       |        last_value(CASE WHEN o.cents IS NOT NULL THEN a.day END IGNORE NULLS) OVER wp AS d0,
       |        last_value(o.cents IGNORE NULLS) OVER wp AS v0,
       |        first_value(CASE WHEN o.cents IS NOT NULL THEN a.day END IGNORE NULLS) OVER wf AS d1,
       |        first_value(o.cents IGNORE NULLS) OVER wf AS v1
       |      FROM alld a LEFT JOIN obs o ON o.day = a.day
       |      WINDOW wp AS (ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |             wf AS (ORDER BY a.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT day, CAST(cents IS NOT NULL AS INTEGER) AS observed,
       |       CASE WHEN cents IS NOT NULL THEN floor(CAST(cents AS DOUBLE) * 10000 + 0.5) / 10000.0
       |            WHEN d0 IS NOT NULL AND d1 IS NOT NULL THEN
       |              floor((v0 + CAST(v1 - v0 AS DOUBLE) * (day - d0) / (d1 - d0)) * 10000 + 0.5) / 10000.0
       |            ELSE NULL END AS val
       |FROM j
       |ORDER BY day""".stripMargin

  /** x377: skyline (Pareto frontier) over documents — the multi-objective
    * selection operator a curation pass runs when no single score orders
    * candidates: keep docs not DOMINATED (another doc >= on both
    * dimensions, > on at least one) on (n_chars, distinct tokens). The
    * engine plan is the classic sort-based 2D skyline — one row per
    * distinct d1 (group max), a running strictly-before max, two integer
    * comparisons — O(n log n), never pairwise; the oracle is the
    * brute-force EXISTS DEFINITION, so the plan is semantically pinned
    * against the textbook predicate. */
  def skylineDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".as("d1"),
        size(array_distinct(split($"text", " "))).cast("long").as("d2"))
    val grp = d.groupBy($"d1").agg(max($"d2").as("gmax"))
    val w = Window.orderBy($"d1".desc)
    val withPrev = grp.withColumn("smax",
      max($"gmax").over(w.rowsBetween(Window.unboundedPreceding, -1)))
    d.join(withPrev, "d1")
      .filter((coalesce($"smax", lit(Long.MinValue)) < $"d2") && ($"gmax" <= $"d2"))
      .select($"doc_id", $"d1".as("n_chars"), $"d2".as("n_distinct"))
      .orderBy("doc_id")
  }

  private val skylineOracle =
    s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS d1,
       |             CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS d2
       |           FROM documents)
       |SELECT doc_id, d1 AS n_chars, d2 AS n_distinct
       |FROM d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM d o
       |  WHERE o.d1 >= d.d1 AND o.d2 >= d.d2 AND (o.d1 > d.d1 OR o.d2 > d.d2))
       |ORDER BY doc_id""".stripMargin

  /** x378 reward threshold (shared with the SPRT tier). */
  private val RewardThresh = 35.0

  /** x378: IPS / SNIPS off-policy evaluation — estimate the value of a
    * DETERMINISTIC target policy ("predict the user's next event type
    * from the global Markov argmax of their previous one", q57's
    * transition matrix turned into a policy) from logged traffic, without
    * deploying it: per logged action a, the inverse-propensity weight is
    * N/cnt(a) (empirical logging propensities), and the per-arm IPS term
    * is matched_rewarded(a)/cnt(a) — exact BIGINT ratios, emitted per arm
    * with the match/reward censuses so IPS = sum(ips_term) and SNIPS's
    * denominator sum(matched(a)/cnt(a)) are reconstructible. */
  def ipsOfflineEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        ($"value" >= RewardThresh).cast("long").as("r"))
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNotNull)
    val trans = ev.groupBy($"prev", $"event_type").agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy($"prev").orderBy($"n".desc, $"event_type")
    val policy = trans.withColumn("rk", row_number().over(wArg))
      .filter($"rk" === 1).select($"prev", $"event_type".as("predicted"))
    ev.join(broadcast(policy), "prev")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(($"predicted" === $"event_type").cast("long")).as("matched"),
        sum(when($"predicted" === $"event_type", $"r").otherwise(0L)).as("matched_reward"))
      .select($"event_type".as("arm"), $"cnt", $"matched", $"matched_reward",
        QueryUtil.halfUp($"matched_reward".cast("double") / $"cnt", 6).as("ips_term"),
        QueryUtil.halfUp($"matched".cast("double") / $"cnt", 6).as("snips_denom_term"))
      .orderBy("arm")
  }

  private val ipsOracle =
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
       |              CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |              CASE WHEN value >= $RewardThresh THEN 1 ELSE 0 END AS r
       |            FROM events),
       |lagd AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
       |         FROM ev),
       |e AS (SELECT * FROM lagd WHERE prev IS NOT NULL),
       |trans AS (SELECT prev, event_type, count(*) AS n FROM e GROUP BY 1, 2),
       |policy AS (SELECT prev, event_type AS predicted
       |           FROM (SELECT *, row_number() OVER (PARTITION BY prev ORDER BY n DESC, event_type) AS rk
       |                 FROM trans) WHERE rk = 1)
       |SELECT e.event_type AS arm, CAST(count(*) AS BIGINT) AS cnt,
       |       CAST(sum(CASE WHEN p.predicted = e.event_type THEN 1 ELSE 0 END) AS BIGINT) AS matched,
       |       CAST(sum(CASE WHEN p.predicted = e.event_type THEN e.r ELSE 0 END) AS BIGINT) AS matched_reward,
       |       floor(CAST(sum(CASE WHEN p.predicted = e.event_type THEN e.r ELSE 0 END) AS DOUBLE)
       |             / count(*) * 1000000 + 0.5) / 1000000.0 AS ips_term,
       |       floor(CAST(sum(CASE WHEN p.predicted = e.event_type THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*) * 1000000 + 0.5) / 1000000.0 AS snips_denom_term
       |FROM e JOIN policy p ON p.prev = e.prev
       |GROUP BY e.event_type
       |ORDER BY arm""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x376_linear_interpolation",
      "exact linear interpolation of a sparse daily series: bracketing-observation windows, edge days stay null (time series)",
      linearInterpolation, Some(linearInterpolationOracle)),
    QueryDef("x377_skyline_docs",
      "skyline / Pareto frontier: sort-based O(n log n) plan pinned against the brute-force EXISTS domination oracle (X4)",
      skylineDocs, Some(skylineOracle)),
    QueryDef("x378_ips_offline_eval",
      "IPS/SNIPS off-policy evaluation of the Markov-argmax routing policy from logged traffic: exact per-arm censuses (stats)",
      ipsOfflineEval, Some(ipsOracle)))
}
