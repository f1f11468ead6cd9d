package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 9: uncertainty + robustness tier — split-conformal
  * prediction intervals (x379), deterministic RANSAC line fitting (x380),
  * and the doubly-robust off-policy estimate completing x378's family
  * (x381). Everything reduces to integer censuses, exact order
  * statistics, or cross-multiplied rational comparisons. */
object Round14Queries9 {

  /** Conformal miscoverage α = 1/10 (exact integer rank arithmetic:
    * q index = ceil(9(n+1)/10)). */
  private val ConfNum = 9
  private val ConfDen = 10

  /** x379: split-conformal prediction intervals per event type — the
    * distribution-free uncertainty wrapper a model-serving pipeline
    * calibrates: a deterministic hash splits events into calibration and
    * test halves; the nonconformity score is the scaled residual
    * |n·cents − sum| against the calibration mean (integer — the n-scaled
    * form avoids rational means); the interval radius is the EXACT
    * ceil(9(n+1)/10)-th order statistic of calibration scores; coverage
    * is then audited on the test half (guaranteed >= 90% in expectation).
    * Scale: two grouped passes + one rank window, all keyed on the small
    * type dimension. */
  def conformalIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        floor($"value" * 100 + lit(0.5)).cast("long").as("cents"),
        (QueryUtil.md5Int(concat_ws("|", lit("conf"), $"event_id"), 4) < 32768L)
          .cast("int").as("is_cal"))
    val stats = ev.filter($"is_cal" === 1).groupBy($"event_type")
      .agg(count(lit(1)).as("n_cal"), sum($"cents").as("cal_sum"))
    val scored = ev.join(broadcast(stats), "event_type")
      .withColumn("score", abs($"n_cal" * $"cents" - $"cal_sum"))
      .localCheckpoint(true) // the rank pass and the coverage pass both scan it
    val wRank = Window.partitionBy($"event_type").orderBy($"score", $"event_id")
    val q = scored.filter($"is_cal" === 1)
      .withColumn("rk", row_number().over(wRank))
      .filter($"rk" === ceil(($"n_cal" + 1) * ConfNum / lit(ConfDen.toDouble)).cast("long"))
      .select($"event_type", $"score".as("q_score"))
    scored.filter($"is_cal" === 0)
      .join(broadcast(q), Seq("event_type"), "left")
      .groupBy($"event_type")
      .agg(max($"n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max($"q_score").as("q_score"),
        sum(($"score" <= $"q_score").cast("long")).as("covered"))
      .select($"event_type", $"n_cal", $"n_test",
        coalesce($"q_score", lit(-1L)).as("q_score"),
        coalesce($"covered", lit(0L)).as("covered"),
        QueryUtil.halfUp(coalesce($"covered", lit(0L)).cast("double") / $"n_test", 4)
          .as("coverage"))
      .orderBy("event_type")
  }

  private val conformalOracle = {
    val h16 = QueryUtil.md5IntSql("concat_ws('|', 'conf', CAST(event_id AS VARCHAR))", 4)
    s"""WITH ev AS (SELECT event_id, event_type,
       |              CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       |              CASE WHEN $h16 < 32768 THEN 1 ELSE 0 END AS is_cal
       |            FROM events),
       |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
       |         CAST(sum(cents) AS BIGINT) AS cal_sum
       |       FROM ev WHERE is_cal = 1 GROUP BY event_type),
       |sc AS (SELECT ev.*, st.n_cal, abs(st.n_cal * ev.cents - st.cal_sum) AS score
       |       FROM ev JOIN st ON st.event_type = ev.event_type),
       |q AS (SELECT event_type, score AS q_score
       |      FROM (SELECT event_type, score, n_cal,
       |              row_number() OVER (PARTITION BY event_type ORDER BY score, event_id) AS rk
       |            FROM sc WHERE is_cal = 1)
       |      WHERE rk = CAST(ceil((n_cal + 1) * $ConfNum / ${ConfDen.toDouble}) AS BIGINT))
       |SELECT sc.event_type, CAST(max(sc.n_cal) AS BIGINT) AS n_cal,
       |       CAST(count(*) AS BIGINT) AS n_test,
       |       CAST(coalesce(max(q.q_score), -1) AS BIGINT) AS q_score,
       |       CAST(coalesce(sum(CASE WHEN sc.score <= q.q_score THEN 1 ELSE 0 END), 0) AS BIGINT) AS covered,
       |       floor(CAST(coalesce(sum(CASE WHEN sc.score <= q.q_score THEN 1 ELSE 0 END), 0) AS DOUBLE)
       |             / count(*) * 10000 + 0.5) / 10000.0 AS coverage
       |FROM sc LEFT JOIN q ON q.event_type = sc.event_type
       |WHERE sc.is_cal = 0
       |GROUP BY sc.event_type
       |ORDER BY sc.event_type""".stripMargin
  }

  /** x380 seeds: the first 8 observed days anchor the candidate lines;
    * inlier tolerance = total/(days*7), derived from the data so it's a
    * shared integer in both engines. */
  private val RansacSeeds = 8

  /** x380: deterministic RANSAC line fit over the daily cents series —
    * robust trend fitting under outliers, with the randomness replaced by
    * a fixed candidate set (all pairs of the first 8 observed days, the
    * reproducibility recipe the sampling family uses): for each candidate
    * line through seeds (d_i,v_i),(d_j,v_j), a day is an inlier when
    * |v·Δd − (v_i·Δd + Δv·(d−d_i))| <= τ·Δd — a CROSS-MULTIPLIED exact
    * integer test, no rational slope ever materialized. Winner = max
    * inliers, tie by (i,j). Emits the winning pair, slope as an integer
    * num/den, inlier count. Scale: candidates are a bounded lattice
    * (28 pairs) broadcast against the series. */
  def ransacLine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"),
        floor($"value" * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("cents"))
      .localCheckpoint(true) // seeds, tau, and the inlier scan all reuse it
    val tau = daily.agg(expr("CAST(sum(cents) DIV (count(1) * 7) AS BIGINT)"))
      .head().getLong(0)
    val wSeed = Window.orderBy($"day")
    val seeds = daily.withColumn("i", row_number().over(wSeed))
      .filter($"i" <= RansacSeeds)
      .select($"i", $"day".as("sd"), $"cents".as("sv"))
    val cand = seeds.select($"i", $"sd".as("di"), $"sv".as("vi"))
      .join(seeds.select($"i".as("j"), $"sd".as("dj"), $"sv".as("vj")), $"i" < $"j")
      .select($"i", $"j", $"di", $"vi", ($"dj" - $"di").as("dd"), ($"vj" - $"vi").as("dv"))
    val wBest = Window.orderBy($"n_inliers".desc, $"i", $"j")
    daily.crossJoin(broadcast(cand))
      .filter(abs($"cents" * $"dd" - ($"vi" * $"dd" + $"dv" * ($"day" - $"di")))
        <= lit(tau) * $"dd")
      .groupBy($"i", $"j", $"dd", $"dv")
      .agg(count(lit(1)).as("n_inliers"))
      .withColumn("rk", row_number().over(wBest))
      .filter($"rk" === 1)
      .select($"i", $"j", $"dv".as("slope_num"), $"dd".as("slope_den"), $"n_inliers",
        lit(tau).as("tau"))
  }

  private val ransacOracle =
    s"""WITH daily AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |               FROM events GROUP BY 1),
       |tau AS (SELECT CAST(sum(cents) // (count(*) * 7) AS BIGINT) AS t FROM daily),
       |seeds AS (SELECT row_number() OVER (ORDER BY day) AS i, day AS sd, cents AS sv
       |          FROM daily QUALIFY i <= $RansacSeeds),
       |cand AS (SELECT a.i, b.i AS j, a.sd AS di, a.sv AS vi,
       |           b.sd - a.sd AS dd, b.sv - a.sv AS dv
       |         FROM seeds a JOIN seeds b ON a.i < b.i),
       |fits AS (SELECT c.i, c.j, c.dd, c.dv, count(*) AS n_inliers
       |         FROM daily d CROSS JOIN cand c CROSS JOIN tau
       |         WHERE abs(d.cents * c.dd - (c.vi * c.dd + c.dv * (d.day - c.di))) <= tau.t * c.dd
       |         GROUP BY c.i, c.j, c.dd, c.dv)
       |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |       CAST(dv AS BIGINT) AS slope_num, CAST(dd AS BIGINT) AS slope_den,
       |       CAST(n_inliers AS BIGINT) AS n_inliers,
       |       (SELECT t FROM tau) AS tau
       |FROM fits
       |ORDER BY n_inliers DESC, i, j
       |LIMIT 1""".stripMargin

  private val RewardThresh = 35.0

  /** x381: doubly-robust off-policy estimate — completes x378's family:
    * a reward MODEL m(a) (per-arm mean on the hash-train half, floored to
    * a 1e-6 integer so both engines hold the identical model) plus the
    * IPS correction on the eval half:
    * DR_t = m(π(prev_t)) + 1[π=a_t]·(r_t − m(a_t))/μ(a_t). Emitted per
    * logged arm as exact integer censuses (model_fp, matched counts,
    * correction numerator) plus the halfUp6 per-arm DR contribution, so
    * the total estimate is the audited sum. */
  def doublyRobustEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        ($"value" >= RewardThresh).cast("long").as("r"),
        (QueryUtil.md5Int(concat_ws("|", lit("dr"), $"event_id"), 4) < 32768L)
          .cast("int").as("is_train"))
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNotNull)
      .localCheckpoint(true) // train half (2 consumers) + eval half reuse it
    val train = ev.filter($"is_train" === 1).localCheckpoint(true)
    val policy = train.groupBy($"prev", $"event_type").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"prev").orderBy($"n".desc, $"event_type")))
      .filter($"rk" === 1).select($"prev", $"event_type".as("predicted"))
    val model = train.groupBy($"event_type")
      .agg(expr("CAST(sum(r) * 1000000 DIV count(*) AS BIGINT)").as("m_fp"))
      .select($"event_type", $"m_fp")
    val eval0 = ev.filter($"is_train" === 0)
      .join(broadcast(policy), "prev")
      .join(broadcast(model.withColumnRenamed("event_type", "predicted")
        .withColumnRenamed("m_fp", "m_pred_fp")), "predicted")
      .join(broadcast(model), "event_type")
    eval0.groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum($"m_pred_fp").as("model_sum_fp"),
        sum(($"predicted" === $"event_type").cast("long")).as("matched"),
        sum(when($"predicted" === $"event_type", $"r" * 1000000L - $"m_fp")
          .otherwise(0L)).as("corr_num_fp"))
      .select($"event_type".as("arm"), $"cnt", $"model_sum_fp", $"matched", $"corr_num_fp",
        QueryUtil.halfUp(($"model_sum_fp" + $"corr_num_fp").cast("double")
          / ($"cnt".cast("double") * 1e6), 6).as("dr_term"))
      .orderBy("arm")
  }

  private val doublyRobustOracle = {
    val h16 = QueryUtil.md5IntSql("concat_ws('|', 'dr', CAST(event_id AS VARCHAR))", 4)
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
       |              CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |              CASE WHEN value >= $RewardThresh THEN 1 ELSE 0 END AS r,
       |              CASE WHEN $h16 < 32768 THEN 1 ELSE 0 END AS is_train
       |            FROM events),
       |lagd AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
       |         FROM ev),
       |e AS (SELECT * FROM lagd WHERE prev IS NOT NULL),
       |tr AS (SELECT * FROM e WHERE is_train = 1),
       |policy AS (SELECT prev, event_type AS predicted
       |           FROM (SELECT prev, event_type, count(*) AS n,
       |                   row_number() OVER (PARTITION BY prev ORDER BY count(*) DESC, event_type) AS rk
       |                 FROM tr GROUP BY prev, event_type) WHERE rk = 1),
       |model AS (SELECT event_type, CAST(sum(r) * 1000000 // count(*) AS BIGINT) AS m_fp
       |          FROM tr GROUP BY event_type)
       |SELECT e.event_type AS arm, CAST(count(*) AS BIGINT) AS cnt,
       |       CAST(sum(mp.m_fp) AS BIGINT) AS model_sum_fp,
       |       CAST(sum(CASE WHEN p.predicted = e.event_type THEN 1 ELSE 0 END) AS BIGINT) AS matched,
       |       CAST(sum(CASE WHEN p.predicted = e.event_type THEN e.r * 1000000 - ma.m_fp ELSE 0 END) AS BIGINT) AS corr_num_fp,
       |       floor(CAST(sum(mp.m_fp) + sum(CASE WHEN p.predicted = e.event_type THEN e.r * 1000000 - ma.m_fp ELSE 0 END) AS DOUBLE)
       |             / (CAST(count(*) AS DOUBLE) * 1e6) * 1000000 + 0.5) / 1000000.0 AS dr_term
       |FROM e
       |JOIN policy p ON p.prev = e.prev
       |JOIN model mp ON mp.event_type = p.predicted
       |JOIN model ma ON ma.event_type = e.event_type
       |WHERE e.is_train = 0
       |GROUP BY e.event_type
       |ORDER BY arm""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x379_conformal_intervals",
      "split-conformal prediction intervals per event type: exact order-statistic radius, test-half coverage audit (stats)",
      conformalIntervals, Some(conformalOracle)),
    QueryDef("x380_ransac_line",
      "deterministic RANSAC line fit on the daily series: fixed seed-pair candidates, cross-multiplied integer inlier test (stats)",
      ransacLine, Some(ransacOracle)),
    QueryDef("x381_doubly_robust_eval",
      "doubly-robust off-policy estimate: hash-train reward model + IPS correction, exact per-arm censuses (stats)",
      doublyRobustEval, Some(doublyRobustOracle)))
}
