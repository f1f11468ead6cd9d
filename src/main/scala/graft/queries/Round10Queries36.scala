package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 thirty-sixth tier: ranking stability and marketing
  * attribution — rank-biased overlap between two revenue rankings
  * (x202) and Markov removal-effect attribution over user journeys
  * (x203, the absorbing-chain upgrade of q49's positional rules). */
object Round10Queries36 {

  /** RBO persistence parameter (p = 0.9 ⇒ top ~10 ranks carry most
    * weight) and evaluation depth. */
  private val RboDepth = 50

  /** Integer suffix-sum table S(m) = Σ_{d=m..k} p^{d-1}/d in 1e-9 fixed
    * point, precomputed in Scala and emitted as literals into BOTH
    * engines (the x87 nDCG literal-discount-table recipe) — the
    * engines never run their own pow(), so there is no libm boundary
    * to disagree on. */
  private val rboSuffixFp: IndexedSeq[Long] = {
    val terms = (1 to RboDepth).map(d => math.pow(0.9, d - 1) / d)
    val suffix = terms.scanRight(0.0)(_ + _).init
    suffix.map(s => math.floor(s * 1e9 + 0.5).toLong)
  }

  // ---------------------------------------------------------------- x202

  /** x202: rank-biased overlap (RBO, Webber et al.) between the
    * part-revenue top-[[RboDepth]] of 1995 and of 1996 — the
    * top-weighted answer to "how stable is this ranking?", where
    * Kendall/Spearman over-penalize tail churn. Identity used:
    * RBO = (1−p)·Σ_d p^{d-1}·|A_d∩B_d|/d, and each common item with
    * ranks (ra, rb) contributes the SUFFIX sum S(max(ra,rb)) — so the
    * whole statistic is one integer sum of table lookups over the
    * joined top-k lists, no per-depth loop. The suffix table is a
    * Scala-precomputed literal in both engines.
    *
    * Scale: two filtered fact aggregates to part grain; the global
    * top-k rank is a WindowGroupLimit-pruned sort on a 2-column
    * frame; the RBO join touches ≤ k rows. */
  def rbo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def topK(yr: Int): DataFrame = {
      val rev = Tables.lineitem(spark, dir)
        .filter(year($"l_shipdate") === yr)
        .groupBy($"l_partkey")
        .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100 + 0.5)
          .cast("long")).as("cents"))
      rev.select($"l_partkey",
        row_number().over(Window.orderBy($"cents".desc, $"l_partkey")).cast("long")
          .as("rk"))
        .filter($"rk" <= RboDepth)
    }
    val a = topK(1995).toDF("pk", "ra")
    val b = topK(1996).toDF("pk", "rb")
    val sfCase = (1 to RboDepth)
      .map(m => s"WHEN $m THEN ${rboSuffixFp(m - 1)}L")
      .mkString("CASE greatest(ra, rb) ", " ", " END")
    a.join(b, "pk")
      .select(expr(sfCase).as("s_fp"))
      .agg(count(lit(1)).as("n_common"), coalesce(sum($"s_fp"), lit(0L)).as("ssum_fp"))
      .select(lit(RboDepth.toLong).as("k"), $"n_common",
        expr("CAST(floor(0.1 * CAST(ssum_fp AS DOUBLE) / 1000.0 + 0.5)" +
          " AS BIGINT)").as("rbo_fp"))
  }

  private val rboOracle = {
    val sfCase = (1 to RboDepth)
      .map(m => s"WHEN $m THEN ${rboSuffixFp(m - 1)}")
      .mkString("CASE greatest(ra, rb) ", " ", " END")
    def topSql(year: Int, rank: String) =
      s"""SELECT l_partkey AS pk, rk AS $rank FROM (
         |  SELECT l_partkey,
         |         CAST(row_number() OVER (ORDER BY cents DESC, l_partkey)
         |              AS BIGINT) AS rk
         |  FROM (SELECT l_partkey,
         |          CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
         |            * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |        FROM lineitem WHERE year(l_shipdate) = $year
         |        GROUP BY l_partkey) r) t
         |WHERE rk <= $RboDepth""".stripMargin
    s"""WITH a AS (${topSql(1995, "ra")}),
       |b AS (${topSql(1996, "rb")}),
       |j AS (SELECT $sfCase AS s_fp FROM a JOIN b USING (pk))
       |SELECT CAST($RboDepth AS BIGINT) AS k,
       |       CAST(count(*) AS BIGINT) AS n_common,
       |       CAST(floor(0.1 * CAST(COALESCE(sum(s_fp), 0) AS DOUBLE) / 1000.0 + 0.5)
       |            AS BIGINT) AS rbo_fp
       |FROM j""".stripMargin
  }

  // ---------------------------------------------------------------- x203

  /** Value-iteration horizon (journeys convert within a handful of
    * steps; both engines truncate at the SAME horizon so parity is
    * exact by construction). */
  private val MarkovIters = 12

  /** State ids: 0=start, 1..4 channels, 5=conversion, 6=drop. */
  private val ConvState = 5
  private val DropState = 6
  private val ChannelNames = Seq(1 -> "click", 2 -> "view", 3 -> "signup", 4 -> "error")

  /** x203: Markov removal-effect attribution — the absorbing-chain
    * model behind "data-driven attribution", replacing q49's
    * positional heuristics. Journeys: each user's event sequence up
    * to their first purchase (conversion) or end of log (drop); the
    * first-order transition counts define the chain. Conversion
    * probability from `start` is computed by [[MarkovIters]] unrolled
    * value-iteration steps in EXACT integer arithmetic
    * (v′(s) = Σ_t cnt(s,t)·v(t) div rowsum(s), v in 1e-9 fixed
    * point) — the same step both engines run, so the truncated-horizon
    * value matches bitwise. Removing channel c reroutes its inbound
    * edges to drop and deletes its outbound rows (denominators keep
    * the original row sums, preserving probability mass); the removal
    * effect v_base − v_c normalized over channels is the published
    * attribution share.
    *
    * Scale: transition extraction is the only data-sized pass (one
    * user-partitioned window); the chain is a ≤ 7×7 matrix × 5
    * scenarios, so the 12 iterations run on ≤ 245-row frames
    * (localCheckpointed each step to keep the plan flat, the x63
    * recipe). */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stateOf = expr("CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2" +
      " WHEN 'signup' THEN 3 WHEN 'error' THEN 4 WHEN 'purchase' THEN 5 END")
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", stateOf.as("st"),
        row_number().over(Window.partitionBy($"user_id")
          .orderBy($"ts", $"event_id")).cast("long").as("rn"))
    val pconv = ev.filter($"st" === ConvState)
      .groupBy($"user_id").agg(min($"rn").as("pc"))
    val kept = ev.join(pconv, Seq("user_id"), "left")
      .filter($"pc".isNull || $"rn" <= $"pc")
    val trans = kept.select(
      coalesce(lag($"st", 1).over(Window.partitionBy($"user_id")
        .orderBy($"rn")), lit(0)).as("src"),
      $"st".as("dst"), $"user_id", $"rn", $"pc")
    val term = kept.filter($"pc".isNull)
      .groupBy($"user_id").agg(max($"rn").as("mr"))
    val tedges = kept.join(term,
      kept("user_id") === term("user_id") && kept("rn") === term("mr"))
      .select(kept("st").as("src"), lit(DropState).as("dst"))
    val counts = trans.select($"src", $"dst")
      .union(tedges)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("cnt"))
    // Scenario expansion: -1 = base chain; c = channel c removed.
    val scen = (Seq(-1) ++ ChannelNames.map(_._1)).toDF("scenario")
    val edges = scen.crossJoin(counts)
      .filter($"src" =!= $"scenario")
      .select($"scenario", $"src",
        when($"dst" === $"scenario", lit(DropState)).otherwise($"dst").as("dst"),
        $"cnt")
      .groupBy($"scenario", $"src", $"dst").agg(sum($"cnt").as("cnt"))
    // The 12 value-iteration steps run as ONE nested-HOF fold per
    // scenario row (≤49 edges × 7 states × 12 steps of plain integer
    // arithmetic) — a single Spark job, versus the 12 tiny
    // checkpointed join rounds the first cut used (measured 3.4–4.5 s
    // of pure job overhead on a ≤35-row frame).
    val initV = s"transform(sequence(0, $DropState), s -> CASE WHEN" +
      s" s = $ConvState THEN CAST(1000000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    val rowsumOf = s"aggregate(filter(es, e -> e.src = s)," +
      s" CAST(0 AS BIGINT), (a, e) -> a + e.cnt)"
    val spOf = s"aggregate(filter(es, e -> e.src = s), CAST(0 AS BIGINT)," +
      s" (a, e) -> a + e.cnt * element_at(v, CAST(e.dst AS INT) + 1))"
    val atStart = edges
      .groupBy($"scenario")
      .agg(collect_list(struct($"src", $"dst", $"cnt")).as("es"))
      .select($"scenario", expr(
        s"""element_at(aggregate(sequence(1, $MarkovIters), $initV,
           |  (v, it) -> transform(sequence(0, $DropState), s ->
           |    CASE WHEN s = $ConvState THEN CAST(1000000000 AS BIGINT)
           |         WHEN s = $DropState THEN CAST(0 AS BIGINT)
           |         ELSE CASE WHEN $rowsumOf > 0
           |                   THEN $spOf div $rowsumOf
           |                   ELSE CAST(0 AS BIGINT) END END)), 1)
           |""".stripMargin).as("v"))
    val base = atStart.filter($"scenario" === -1)
      .select($"v".as("v_base_fp"))
    val removed = atStart.filter($"scenario" =!= -1)
      .crossJoin(broadcast(base))
      .select($"scenario".as("channel_id"), $"v".as("v_rem_fp"), $"v_base_fp",
        ($"v_base_fp" - $"v").as("re_fp"))
    val tot = removed.agg(sum($"re_fp").as("re_tot"))
    val named = ChannelNames.map { case (id, nm) => (id, nm) }
      .toDF("channel_id", "channel")
    removed.crossJoin(broadcast(tot))
      .join(broadcast(named), Seq("channel_id"))
      .select($"channel", $"v_base_fp", $"v_rem_fp", $"re_fp",
        expr("CASE WHEN re_tot > 0 THEN CAST(floor(CAST(re_fp AS DOUBLE)" +
          " / CAST(re_tot AS DOUBLE) * 1000000 + 0.5) AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END").as("share_fp"))
      .orderBy($"channel")
  }

  private val markovOracle = {
    val iterCtes = (1 to MarkovIters).map { i =>
      s"""v$i AS (
         |  SELECT st.scenario, st.state,
         |         CASE WHEN st.state = $ConvState THEN 1000000000
         |              WHEN st.state = $DropState THEN 0
         |              ELSE COALESCE(x.nv, 0) END AS v
         |  FROM states st LEFT JOIN (
         |    SELECT e.scenario, e.src AS state,
         |           CAST(sum(e.cnt * pv.v) // max(rs.rowsum) AS BIGINT) AS nv
         |    FROM edges e
         |    JOIN v${i - 1} pv ON pv.scenario = e.scenario AND pv.state = e.dst
         |    JOIN rowsums rs ON rs.scenario = e.scenario AND rs.state = e.src
         |    GROUP BY e.scenario, e.src) x
         |  ON x.scenario = st.scenario AND x.state = st.state)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val chanVals = ChannelNames
      .map { case (id, nm) => s"($id, '$nm')" }.mkString(", ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id,
       |         CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
       |              WHEN 'signup' THEN 3 WHEN 'error' THEN 4
       |              WHEN 'purchase' THEN 5 END AS st,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |pconv AS MATERIALIZED (SELECT user_id, min(rn) AS pc FROM ev WHERE st = $ConvState
       |          GROUP BY user_id),
       |kept AS MATERIALIZED (SELECT e.user_id, e.st, e.rn, p.pc
       |         FROM ev e LEFT JOIN pconv p ON e.user_id = p.user_id
       |         WHERE p.pc IS NULL OR e.rn <= p.pc),
       |trans AS (
       |  SELECT COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY rn), 0) AS src,
       |         st AS dst
       |  FROM kept),
       |term AS (SELECT user_id, max(rn) AS mr FROM kept WHERE pc IS NULL
       |         GROUP BY user_id),
       |tedges AS (SELECT k.st AS src, $DropState AS dst
       |           FROM kept k JOIN term t ON k.user_id = t.user_id AND k.rn = t.mr),
       |counts AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
       |           FROM (SELECT src, dst FROM trans
       |                 UNION ALL SELECT src, dst FROM tedges) u
       |           GROUP BY src, dst),
       |scen AS (SELECT -1 AS scenario UNION ALL SELECT 1 UNION ALL SELECT 2
       |         UNION ALL SELECT 3 UNION ALL SELECT 4),
       |edges AS MATERIALIZED (
       |  SELECT s.scenario, c.src,
       |         CASE WHEN c.dst = s.scenario THEN $DropState ELSE c.dst END AS dst,
       |         CAST(sum(c.cnt) AS BIGINT) AS cnt
       |  FROM scen s JOIN counts c ON c.src <> s.scenario
       |  GROUP BY s.scenario, c.src,
       |           CASE WHEN c.dst = s.scenario THEN $DropState ELSE c.dst END),
       |rowsums AS MATERIALIZED (SELECT scenario, src AS state, CAST(sum(cnt) AS BIGINT) AS rowsum
       |            FROM edges GROUP BY scenario, src),
       |states AS MATERIALIZED (SELECT s.scenario, g.state FROM scen s
       |           CROSS JOIN (SELECT unnest(range(0, ${DropState + 1})) AS state) g),
       |v0 AS (SELECT scenario, state,
       |              CASE WHEN state = $ConvState THEN 1000000000 ELSE 0 END AS v
       |       FROM states)$iterCtes,
       |at_start AS (SELECT scenario, v FROM v$MarkovIters WHERE state = 0),
       |base AS (SELECT v AS v_base_fp FROM at_start WHERE scenario = -1),
       |removed AS (
       |  SELECT a.scenario AS channel_id, a.v AS v_rem_fp, b.v_base_fp,
       |         b.v_base_fp - a.v AS re_fp
       |  FROM at_start a, base b WHERE a.scenario <> -1),
       |tot AS (SELECT CAST(sum(re_fp) AS BIGINT) AS re_tot FROM removed),
       |named(channel_id, channel) AS (VALUES $chanVals)
       |SELECT n.channel, r.v_base_fp, r.v_rem_fp, r.re_fp,
       |       CASE WHEN t.re_tot > 0 THEN CAST(floor(CAST(r.re_fp AS DOUBLE)
       |              / CAST(t.re_tot AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
       |            ELSE 0 END AS share_fp
       |FROM removed r JOIN named n ON n.channel_id = r.channel_id, tot t
       |ORDER BY n.channel""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x202_rbo",
      "rank-biased overlap between the 1995 and 1996 part-revenue top-50: literal suffix-weight table, one integer sum over the joined lists",
      rbo, Some(rboOracle)),
    QueryDef("x203_markov_attribution",
      "Markov removal-effect attribution over user journeys: exact-integer 12-step value iteration, base vs per-channel-removed chains",
      markovAttribution, Some(markovOracle)))
}
