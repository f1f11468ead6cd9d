package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 tenth tier: three governance/assembly staples — local-DP
  * randomized response with exact debiasing (the collection-side
  * privacy mechanism next to the k-anonymity/l-diversity/t-closeness/
  * PSI publication-side screens), cross-shard quantile normalization
  * (the batch-effect corrector for corpora assembled from heterogeneous
  * sources), and a Simpson's-paradox stratification audit (pooled vs
  * per-stratum association direction by exact cross-multiplication).
  * All arithmetic is integer/rational — no libm anywhere.
  */
object Round11Queries10 {

  /** Randomized-response keep-probability p = 3/4 as an exact 16-bit
    * lattice threshold (49152/65536), and the hash multiplier shared
    * with the repo's other deterministic-simulation queries. */
  private val RrKeepNum = 49152L
  private val RrLattice = 65536L
  private val RrMul = 2654435761L

  // ---------------------------------------------------------------- x265

  /** x265: randomized response (Warner 1965) with exact debiasing — the
    * local-DP collection mechanism: each customer reports their true
    * bit (account in credit) with p = 3/4, the flipped bit otherwise
    * (ε = ln 3). The flip is simulated with the repo's deterministic
    * 16-bit hash lattice so both engines draw identical "randomness";
    * the aggregator then inverts the mechanism per market segment:
    * n̂₁ = (obs₁ − n·(1−p)) / (2p−1), which at p = 3/4 is the exact
    * half-integer (4·obs₁ − n)/2 — emitted as the integer numerator
    * plus the audit against the true count the mechanism hid.
    *
    * Scale: one projection + one group-by; the estimator is a pure
    * post-aggregation formula — this is how you collect a sensitive
    * rate from 10⁹ users without ever storing a true bit. */
  def randomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reported = Tables.customer(spark, dir)
      .select($"c_mktsegment".as("segment"),
        when($"c_acctbal" > 0.0, 1L).otherwise(0L).as("t"),
        (($"c_custkey" * lit(RrMul)) % lit(RrLattice)).as("h"))
      .withColumn("r", when($"h" < RrKeepNum, $"t").otherwise(lit(1L) - $"t"))
    reported.groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"t").as("true1"), sum($"r").as("obs1"))
      .select($"segment", $"n", $"true1", $"obs1",
        (lit(4L) * $"obs1" - $"n").as("est_num_halves"),
        ((lit(4L) * $"obs1" - $"n").cast("double") / 2.0).as("est1"),
        QueryUtil.halfUp4(
          abs((lit(4L) * $"obs1" - $"n").cast("double") / 2.0
            - $"true1".cast("double")) / $"true1".cast("double")).as("rel_err"))
      .orderBy($"segment")
  }

  private val randomizedResponseOracle =
    s"""WITH reported AS (
       |  SELECT c_mktsegment AS segment,
       |         CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END AS t,
       |         CASE WHEN (c_custkey * $RrMul) % $RrLattice < $RrKeepNum
       |              THEN CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END
       |              ELSE 1 - CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END
       |         END AS r
       |  FROM customer),
       |agg AS (
       |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(t) AS BIGINT) AS true1, CAST(sum(r) AS BIGINT) AS obs1
       |  FROM reported GROUP BY segment)
       |SELECT segment, n, true1, obs1,
       |       4 * obs1 - n AS est_num_halves,
       |       CAST(4 * obs1 - n AS DOUBLE) / 2.0 AS est1,
       |       floor(abs(CAST(4 * obs1 - n AS DOUBLE) / 2.0 - CAST(true1 AS DOUBLE))
       |             / CAST(true1 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS rel_err
       |FROM agg
       |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- x266

  /** x266: cross-shard quantile normalization — the batch-effect
    * corrector for corpora assembled from heterogeneous sources: each
    * document's length is replaced by the POOLED value at the same
    * relative rank within its shard (`k = ceil(rank·N/n_shard)`), so
    * every shard's post-normalization distribution is the pooled one.
    * All rank arithmetic is exact integer; the audit emits per-shard
    * mean/median before and after (the "after" columns converging
    * across shards is the operator's contract).
    *
    * Scale: one per-shard rank (partitioned window), one pooled rank (a
    * global range-partitioned sort — TeraSort-shaped, and the x260
    * histogram drill-down is the sort-free alternative when only fixed
    * quantiles are needed), one equi-join on the computed rank. No
    * stage is quadratic. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter($"n_chars" > 0)
      .select($"source", $"doc_id", $"n_chars".cast("long").as("v"))
      .localCheckpoint(true)
    val pooled = docs
      .withColumn("rp", row_number().over(Window.orderBy($"v", $"doc_id"))
        .cast("long"))
      .select($"rp", $"v".as("pv"))
    val nn = docs.agg(count(lit(1)).as("n_total"))
    val shard = docs
      .withColumn("rs", row_number().over(
        Window.partitionBy($"source").orderBy($"v", $"doc_id")).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy($"source")))
      .crossJoin(broadcast(nn))
      .withColumn("k", expr("(rs * n_total + ns - 1) DIV ns"))
    val normed = shard.join(pooled, $"k" === $"rp")
    normed.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        QueryUtil.halfUp4(avg($"v")).as("mean_before"),
        max(when($"rs" === expr("(ns + 1) DIV 2"), $"v")).as("p50_before"),
        QueryUtil.halfUp4(avg($"pv")).as("mean_after"),
        max(when($"rs" === expr("(ns + 1) DIV 2"), $"pv")).as("p50_after"),
        max($"n_total").as("n_total"))
      .orderBy($"source")
  }

  private val quantileNormalizeOracle =
    """WITH docs AS MATERIALIZED (
      |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE n_chars > 0),
      |pooled AS MATERIALIZED (
      |  SELECT CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS rp,
      |         v AS pv
      |  FROM docs),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM docs),
      |shard AS (
      |  SELECT source, v,
      |         CAST(row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
      |              AS BIGINT) AS rs,
      |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
      |  FROM docs),
      |shardk AS (
      |  SELECT s.*, nn.n_total, (s.rs * nn.n_total + s.ns - 1) // s.ns AS k
      |  FROM shard s, nn),
      |normed AS (
      |  SELECT sk.source, sk.v, sk.rs, sk.ns, sk.n_total, p.pv
      |  FROM shardk sk JOIN pooled p ON sk.k = p.rp)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       floor(avg(v) * 10000 + 0.5) / 10000.0 AS mean_before,
      |       max(CASE WHEN rs = (ns + 1) // 2 THEN v END) AS p50_before,
      |       floor(avg(pv) * 10000 + 0.5) / 10000.0 AS mean_after,
      |       max(CASE WHEN rs = (ns + 1) // 2 THEN pv END) AS p50_after,
      |       max(n_total) AS n_total
      |FROM normed
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- x267

  /** x267: Simpson's-paradox stratification audit — does the pooled
    * urgent-order rate comparison between the AUTOMOBILE and BUILDING
    * segments hold within every order-year stratum? Rate comparisons
    * are exact integer cross-multiplications (uA·nB vs uB·nA), never
    * float division, so the per-stratum direction signs and the
    * pooled-vs-stratified agreement counts are engine-exact. The
    * classic confounding screen every observational A/B readout needs.
    *
    * Scale: one join-free pass over orders (segment via a broadcast
    * customer dim), one group-by per stratum, one 7-row pooled fold. */
  def simpsonAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .select(year($"o_orderdate").cast("long").as("yr"),
        ($"c_mktsegment" === "AUTOMOBILE").as("is_a"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("u"))
    val strata = base.groupBy($"yr").agg(
      sum(when($"is_a", 1L).otherwise(0L)).as("na"),
      sum(when($"is_a", $"u").otherwise(0L)).as("ua"),
      sum(when(!$"is_a", 1L).otherwise(0L)).as("nb"),
      sum(when(!$"is_a", $"u").otherwise(0L)).as("ub"))
      .withColumn("dir", signum($"ua" * $"nb" - $"ub" * $"na").cast("long"))
      .localCheckpoint(true)
    val pooled = strata.agg(
      sum($"na").as("pna"), sum($"ua").as("pua"),
      sum($"nb").as("pnb"), sum($"ub").as("pub"))
      .select(signum($"pua" * $"pnb" - $"pub" * $"pna").cast("long").as("pooled_dir"),
        $"pna", $"pua", $"pnb", $"pub")
    val flags = strata.agg(
      count(lit(1)).as("n_strata"),
      sum(when($"dir" === lit(0L), 1L).otherwise(0L)).as("n_tied"))
    strata.crossJoin(broadcast(pooled)).crossJoin(broadcast(flags))
      .withColumn("agrees_pooled",
        when($"dir" === $"pooled_dir", 1L).otherwise(0L))
      .select($"yr", $"na", $"ua", $"nb", $"ub", $"dir",
        $"pooled_dir", $"n_strata", $"n_tied", $"agrees_pooled")
      .orderBy($"yr")
  }

  private val simpsonAuditOracle =
    """WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |         c_mktsegment = 'AUTOMOBILE' AS is_a,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
      |strata AS MATERIALIZED (
      |  SELECT yr,
      |         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(sum(CASE WHEN is_a THEN u ELSE 0 END) AS BIGINT) AS ua,
      |         CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |         CAST(sum(CASE WHEN NOT is_a THEN u ELSE 0 END) AS BIGINT) AS ub
      |  FROM base GROUP BY yr),
      |sdir AS (SELECT *, CAST(sign(ua * nb - ub * na) AS BIGINT) AS dir FROM strata),
      |pooled AS (
      |  SELECT CAST(sign(sum(ua) * sum(nb) - sum(ub) * sum(na)) AS BIGINT)
      |           AS pooled_dir
      |  FROM strata),
      |flags AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |         CAST(sum(CASE WHEN dir = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      |  FROM sdir)
      |SELECT yr, na, ua, nb, ub, dir, pooled_dir, n_strata, n_tied,
      |       CASE WHEN dir = pooled_dir THEN 1 ELSE 0 END AS agrees_pooled
      |FROM sdir, pooled, flags
      |ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x265_randomized_response",
      "local-DP randomized response (p=3/4 lattice) with exact half-integer debiasing per segment",
      randomizedResponse, Some(randomizedResponseOracle)),
    QueryDef("x266_quantile_normalize",
      "cross-shard quantile normalization onto pooled ranks with before/after audit",
      quantileNormalize, Some(quantileNormalizeOracle)),
    QueryDef("x267_simpson_audit",
      "Simpson's-paradox screen: pooled vs per-stratum urgent-rate direction, exact cross-multiplied",
      simpsonAudit, Some(simpsonAuditOracle)))
}
