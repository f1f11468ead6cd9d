package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 ninth tier: three distributed staples still missing from
  * the suite — Luby's maximal independent set (THE symmetry-breaking
  * primitive behind distributed scheduling/coloring, here with fixed
  * hash priorities so the parallel peel is deterministic), the
  * Theil–Sen robust trend estimator (median of pairwise slopes — the
  * outlier-proof counterpart to q70's exact-moment OLS), and the AMS
  * tug-of-war F2 sketch (second frequency moment — the self-join-size
  * estimator that completes the sketch family next to CMS/Count-Sketch/
  * HLL/KMV/Bloom). All three are exact-integer constructions, so every
  * trained/estimated value is bit-identical across engines.
  */
object Round11Queries9 {

  /** Luby peel rounds. The 25-node trade graph settles in ≤3; extra
    * rounds are idempotent no-ops on empty live sets. The convergence
    * proof is the emitted `live_final` audit column (0 ⇒ the MIS is
    * maximal by construction). */
  private val MisRounds = 6

  /** Graph sparsification: keep each node's top-K heaviest trade edges
    * before the symmetric closure. */
  private val MisTopK = 3

  /** Deterministic node priority: v * K mod P with P prime — injective
    * on any node domain smaller than P/K differences, so ties are
    * impossible and the parallel local-max peel is fully determined. */
  private val MisMul = 2654435761L
  private val MisMod = 1000000007L

  /** AMS sketch width: 128 sign counters in 8 groups of 16 (median of
    * group means — chi²₁₆-tight, measured ~10-22% rel. error on the
    * fixture vs ~90% for a naive affine hash, see amsSignSql). */
  private val AmsCounters = 128
  private val AmsGroups = 8

  /** AMS ±1 hash, rendered ONCE as SQL and used verbatim by BOTH
    * engines (Spark via expr()): a degree-3 polynomial over Z_p in the
    * user id with per-counter coefficients — the 4-wise-independent
    * family the AMS variance bound requires. Affine mixes (u*A + i*B
    * mod p) looked random but left neighboring user ids sign-correlated
    * and the estimate 10× low; the cubic restores E[c²]=F2 empirically.
    * Horner with a mod after every multiply keeps all intermediates
    * < 1e18 (DuckDB BIGINT overflow THROWS rather than wraps). */
  private val amsSignSql: String = {
    def coef(k: Int): String =
      s"(((i + 1) * $MisMul + ${(k + 1) * 97531L} * (i + 7)) % $MisMod)"
    val v = s"(u % $MisMod)"
    val h = (1 to 3).foldLeft(coef(0)) { (acc, k) =>
      s"(($acc * $v + ${coef(k)}) % $MisMod)"
    }
    s"(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END)"
  }

  // ---------------------------------------------------------------- x262

  /** x262: Luby's maximal independent set over the nation trade graph —
    * deterministic variant: node priority is a fixed injective hash; in
    * each synchronous round every live node whose priority exceeds ALL
    * live neighbors' joins the MIS, then it and its neighbors leave the
    * live set. With fixed priorities the parallel peel equals the
    * sequential greedy MIS in priority order, and it finishes in
    * O(log n) expected rounds — the classic symmetry-breaking result.
    * Emits MIS members with the round they joined plus audit columns
    * (node count, MIS size, live nodes after the last round — 0 proves
    * maximality).
    *
    * Spark: each round is two |E|-sized equi-joins (restrict edges to
    * live×live), one max-aggregate, and two anti-joins — no all-pairs
    * stage; frames after the trade aggregation are |V|-sized and
    * checkpointed per round. At entity scale the round count stays
    * O(log n) whp, each round the same keyed joins at |E| cost — the
    * published distributed-MIS recipe. Oracle: identical rounds
    * unrolled as CTEs on the shared trade-graph SQL. */
  def lubyMis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Sparsify to each nation's top-[[MisTopK]] heaviest trade partners
    // (symmetric closure) — the dense trade graph has diameter ≤3 so its
    // MIS is one node peeled in one round; the k-NN-shaped subgraph makes
    // the peel run several genuine rounds, like the entity graphs the
    // primitive is for. Rank tie-break (w DESC, dst) is total.
    val wTop = Window.partitionBy($"src").orderBy($"w".desc, $"dst")
    val top = Round11Queries4.tradeEdges(spark, dir)
      .select($"src".cast("long").as("src"), $"dst".cast("long").as("dst"), $"w")
      .withColumn("rn", row_number().over(wTop))
      .filter($"rn" <= MisTopK)
      .select($"src", $"dst")
    val edges = top.unionByName(top.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(true)
    val nodes = edges.select($"src".as("v")).distinct()
      .withColumn("p", ($"v" * lit(MisMul)) % lit(MisMod))
      .localCheckpoint(true)
    var live = nodes
    var mis = spark.range(0).select($"id".as("v"), $"id".as("p"),
      $"id".as("round_joined"))
    for (r <- 1 to MisRounds) {
      val nmax = edges
        .join(live.select($"v".as("src"), $"p".as("sp")), "src")
        .join(live.select($"v".as("dst")), "dst")
        .groupBy($"dst".as("v")).agg(max($"sp").as("nmax"))
      val misR = live.join(nmax, Seq("v"), "left")
        .filter($"nmax".isNull || $"p" > $"nmax")
        .select($"v", $"p").localCheckpoint(true)
      val rem = edges.join(misR.select($"v".as("src")), "src")
        .select($"dst".as("v")).distinct()
      mis = mis.unionByName(misR.withColumn("round_joined", lit(r).cast("long")))
      live = live.join(misR.select($"v"), Seq("v"), "left_anti")
        .join(rem, Seq("v"), "left_anti")
        .localCheckpoint(true)
    }
    val audit = nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(mis.agg(count(lit(1)).as("n_mis"))))
      .crossJoin(broadcast(live.agg(count(lit(1)).as("live_final"))))
    mis.join(broadcast(Tables.nation(spark, dir)), $"v" === $"n_nationkey")
      .crossJoin(broadcast(audit))
      .select($"v".as("nationkey"), $"n_name", $"p".as("priority"),
        $"round_joined", $"n_nodes", $"n_mis", $"live_final")
      .orderBy("nationkey")
  }

  private def misRoundSql(r: Int): String = {
    val prev = s"live${r - 1}"
    s"""nb$r AS (
       |  SELECT e.dst AS v, max(s.p) AS nmax
       |  FROM sedges e JOIN $prev s ON s.v = e.src JOIN $prev d ON d.v = e.dst
       |  GROUP BY e.dst),
       |mis$r AS MATERIALIZED (
       |  SELECT l.v, l.p FROM $prev l LEFT JOIN nb$r n ON n.v = l.v
       |  WHERE n.nmax IS NULL OR l.p > n.nmax),
       |rem$r AS (
       |  SELECT DISTINCT e.dst AS v FROM sedges e JOIN mis$r m ON m.v = e.src),
       |live$r AS MATERIALIZED (
       |  SELECT l.v, l.p FROM $prev l
       |  WHERE NOT EXISTS (SELECT 1 FROM mis$r m WHERE m.v = l.v)
       |    AND NOT EXISTS (SELECT 1 FROM rem$r x WHERE x.v = l.v))""".stripMargin
  }

  private val lubyMisOracle = {
    val rounds = (1 to MisRounds).map(misRoundSql).mkString(",\n")
    val unions = (1 to MisRounds)
      .map(r => s"SELECT v, p, CAST($r AS BIGINT) AS round_joined FROM mis$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${Round11Queries4.tradeCtes},
       |topk AS (
       |  SELECT src, dst FROM (
       |    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       |           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
       |    FROM edges) WHERE rn <= $MisTopK),
       |sedges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM topk
       |    UNION ALL SELECT dst AS src, src AS dst FROM topk)),
       |live0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, (src * $MisMul) % $MisMod AS p
       |  FROM sedges),
       |$rounds,
       |allmis AS MATERIALIZED (
       |  $unions),
       |audit AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM live0) AS n_nodes,
       |         (SELECT CAST(count(*) AS BIGINT) FROM allmis) AS n_mis,
       |         (SELECT CAST(count(*) AS BIGINT) FROM live$MisRounds) AS live_final)
       |SELECT m.v AS nationkey, n.n_name, m.p AS priority, m.round_joined,
       |       n_nodes, n_mis, live_final
       |FROM allmis m JOIN nation n ON n.n_nationkey = m.v, audit
       |ORDER BY nationkey""".stripMargin
  }

  // ---------------------------------------------------------------- x263

  /** x263: Theil–Sen robust trend — per customer nation, the MEDIAN of
    * all pairwise slopes between monthly revenue points (integer cents
    * over integer month indexes). Up to 29.3% of the months can be
    * corrupted before the estimate moves, versus a single outlier for
    * q70's OLS line. Slopes are exact rationals `num/den` (den > 0);
    * the ordering key is the IEEE double num/den — correctly-rounded
    * division of identical integers, engine-stable — with (num, den) as
    * the deterministic tie-break, and the lower median is selected by
    * rank so no cross-pair averaging ever happens. The median pair's
    * exact (num, den) is emitted alongside the quantized slope.
    *
    * Scale: the corpus-sized stage is the orders→monthly aggregation
    * (one hash agg); the pair self-join is bounded by the CALENDAR per
    * group (80 months ⇒ ≤3,160 pairs/nation regardless of row count),
    * so the quadratic stage never touches corpus-sized data. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("ck"),
        ((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
          .cast("long").as("m"),
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy($"ck", $"m").agg(sum($"cents").as("y"))
      .localCheckpoint(true)
    val a = monthly.select($"ck", $"m".as("m1"), $"y".as("y1"))
    val b = monthly.select($"ck".as("ck2"), $"m".as("m2"), $"y".as("y2"))
    val pairs = a.join(broadcast(b), $"ck" === $"ck2" && $"m1" < $"m2")
      .select($"ck", ($"y2" - $"y1").as("num"), ($"m2" - $"m1").as("den"))
      .withColumn("sd", $"num".cast("double") / $"den".cast("double"))
    val w = Window.partitionBy($"ck")
    val rk = pairs
      .withColumn("rn", row_number().over(w.orderBy($"sd", $"num", $"den")))
      .withColumn("np", count(lit(1)).over(w))
      .filter($"rn" === expr("(np + 1) DIV 2"))
    val months = monthly.groupBy($"ck").agg(count(lit(1)).as("n_months"))
    rk.join(broadcast(months), "ck")
      .join(broadcast(Tables.nation(spark, dir)), $"ck" === $"n_nationkey")
      .select($"ck".as("nationkey"), $"n_name", $"n_months",
        $"np".as("n_pairs"), $"num".as("med_num"), $"den".as("med_den"),
        QueryUtil.halfUp4($"sd").as("slope_cents"))
      .orderBy("nationkey")
  }

  private val theilSenOracle =
    """WITH monthly AS MATERIALIZED (
      |  SELECT CAST(c.c_nationkey AS BIGINT) AS ck,
      |         CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
      |              AS BIGINT) AS m,
      |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      |              AS BIGINT) AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.ck, b.y - a.y AS num, b.m - a.m AS den,
      |         CAST(b.y - a.y AS DOUBLE) / CAST(b.m - a.m AS DOUBLE) AS sd
      |  FROM monthly a JOIN monthly b ON a.ck = b.ck AND a.m < b.m),
      |rk AS (
      |  SELECT ck, num, den, sd,
      |         row_number() OVER (PARTITION BY ck ORDER BY sd, num, den) AS rn,
      |         CAST(count(*) OVER (PARTITION BY ck) AS BIGINT) AS np
      |  FROM pairs),
      |mo AS (SELECT ck, CAST(count(*) AS BIGINT) AS n_months
      |       FROM monthly GROUP BY ck)
      |SELECT r.ck AS nationkey, n.n_name, mo.n_months, r.np AS n_pairs,
      |       r.num AS med_num, r.den AS med_den,
      |       floor(r.sd * 10000 + 0.5) / 10000.0 AS slope_cents
      |FROM rk r JOIN mo ON mo.ck = r.ck JOIN nation n ON n.n_nationkey = r.ck
      |WHERE r.rn = (r.np + 1) // 2
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- x264

  /** x264: AMS tug-of-war F2 sketch — estimates the second frequency
    * moment Σ f(u)² of per-user event counts (= the self-join size that
    * drives shuffle-cost estimates) from [[AmsCounters]] signed
    * counters: counter i accumulates `sign_i(user) * f(user)` where
    * `sign_i` is a fixed ±1 hash, so each counter² is an unbiased F2
    * estimate; variance is tamed by median-of-[[AmsGroups]]-group-means.
    * Every counter is an exact integer sum (order-free); group means
    * share one fixed denominator, so the median-of-means is selected
    * by ranking the integer group SUMS — no floating point until the
    * final audit ratio. The exact F2 is computed alongside and the
    * relative error emitted.
    *
    * Scale: one hash-agg to per-user counts, then a 64-way explode of
    * the (small) user frame into partial integer sums — mergeable
    * across partitions/shards by construction, the property that lets
    * 1000 executors sketch 100 TB and combine 64 longs. */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.events(spark, dir)
      .groupBy($"user_id".cast("long").as("u")).agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    val signed = freq
      .select($"u", $"f",
        explode(sequence(lit(0L), lit((AmsCounters - 1).toLong))).as("i"))
      .withColumn("s", expr(amsSignSql).cast("long"))
    val counters = signed.groupBy($"i").agg(sum($"s" * $"f").as("c"))
    val groups = counters
      .withColumn("g", expr(s"i DIV ${AmsCounters / AmsGroups}"))
      .groupBy($"g").agg(sum($"c" * $"c").as("gsum"))
    val med = groups
      .withColumn("rn", row_number().over(Window.orderBy($"gsum", $"g")))
      .filter($"rn" === lit((AmsGroups + 1) / 2))
      .select($"gsum")
    val exact = freq.agg(count(lit(1)).as("n_users"), sum($"f").as("n_events"),
      sum($"f" * $"f").as("exact_f2"))
    exact.crossJoin(broadcast(med))
      .select($"n_events", $"n_users", $"exact_f2", $"gsum".as("med_group_sum"),
        ($"gsum".cast("double") / lit((AmsCounters / AmsGroups).toDouble)).as("est_f2"),
        QueryUtil.halfUp4(
          abs($"gsum".cast("double") / lit((AmsCounters / AmsGroups).toDouble)
            - $"exact_f2".cast("double")) / $"exact_f2".cast("double")).as("rel_err"))
  }

  private val amsF2Oracle = {
    val gw = AmsCounters / AmsGroups
    s"""WITH freq AS MATERIALIZED (
       |  SELECT CAST(user_id AS BIGINT) AS u, CAST(count(*) AS BIGINT) AS f
       |  FROM events GROUP BY 1),
       |sgn AS (
       |  SELECT i, $amsSignSql * f AS sf
       |  FROM freq, (SELECT CAST(unnest(range($AmsCounters)) AS BIGINT) AS i)),
       |counters AS (SELECT i, CAST(sum(sf) AS BIGINT) AS c FROM sgn GROUP BY i),
       |gsums AS (
       |  SELECT i // $gw AS g, CAST(sum(c * c) AS BIGINT) AS gsum
       |  FROM counters GROUP BY 1),
       |med AS (
       |  SELECT gsum FROM (
       |    SELECT gsum, row_number() OVER (ORDER BY gsum, g) AS rn FROM gsums)
       |  WHERE rn = ${(AmsGroups + 1) / 2}),
       |exact AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |         CAST(sum(f) AS BIGINT) AS n_events,
       |         CAST(sum(f * f) AS BIGINT) AS exact_f2
       |  FROM freq)
       |SELECT n_events, n_users, exact_f2, gsum AS med_group_sum,
       |       CAST(gsum AS DOUBLE) / $gw.0 AS est_f2,
       |       floor(abs(CAST(gsum AS DOUBLE) / $gw.0 - CAST(exact_f2 AS DOUBLE))
       |             / CAST(exact_f2 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS rel_err
       |FROM exact, med""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x262_luby_mis",
      "Luby maximal independent set, deterministic hash priorities, convergence-audited",
      lubyMis, Some(lubyMisOracle)),
    QueryDef("x263_theil_sen",
      "Theil-Sen robust trend: exact-rational median of pairwise monthly slopes per nation",
      theilSen, Some(theilSenOracle)),
    QueryDef("x264_ams_f2",
      "AMS tug-of-war F2 sketch (64 sign counters, median-of-means) vs exact second moment",
      amsF2, Some(amsF2Oracle)))
}
