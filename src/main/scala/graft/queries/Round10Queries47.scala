package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 forty-seventh tier: whole-graph centrality and network
  * autocorrelation on the nation trade graph — harmonic closeness via
  * all-pairs BFS (x223) and Moran's I of account balance over trade
  * adjacency (x224). */
object Round10Queries47 {

  /** BFS rounds (nation-graph diameter is well under this). */
  private val BfsRounds = 6

  /** Shared nation-graph SQL: symmetric trade edges with weights. */
  private val tradeCtes =
    """trade AS MATERIALIZED (
      |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey),
      |edges AS MATERIALIZED (
      |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
      |    SELECT cn AS src, sn AS dst FROM trade
      |    UNION ALL SELECT sn AS src, cn AS dst FROM trade) u
      |  GROUP BY src, dst)""".stripMargin

  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trade = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .select($"c_nationkey".as("cn"), $"s_nationkey".as("sn"))
    trade.select($"cn".as("src"), $"sn".as("dst"))
      .unionByName(trade.select($"sn".as("src"), $"cn".as("dst")))
      .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
  }

  // ---------------------------------------------------------------- x223

  /** x223: harmonic closeness centrality — Σ_{j≠i} 1/d(i,j) over
    * all-pairs shortest hops, the centrality that handles
    * disconnection gracefully (unreachable pairs contribute 0, no
    * infinite sums). All-pairs BFS runs [[BfsRounds]] unrolled
    * min-plus expansions of the distance frame (the x65 frontier
    * join, all sources at once); 1/d quantizes to floor(1e6/d) —
    * integer division on positives — so the centrality is one exact
    * integer sum per node. Ranked output with nation names.
    *
    * Scale: the trade aggregation is the data-sized pass (the x63
    * shape); the BFS frames are |V|²-bounded (25² here) — whole-graph
    * centralities like this are for DIMENSION graphs; entity-scale
    * graphs get the sampled/seeded treatments (x104 PPR). */
  def harmonicCloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, dir).select($"src", $"dst")
      .localCheckpoint(true)
    val init = edges.select($"src".as("a")).distinct()
      .select($"a", $"a".as("b"), lit(0L).as("d"))
    val dist = (1 to BfsRounds).foldLeft(init) { (cur, _) =>
      val expanded = cur.as("c").join(edges.as("e"), $"c.b" === $"e.src")
        .select($"c.a".as("a"), $"e.dst".as("b"), ($"c.d" + 1L).as("d"))
      cur.unionByName(expanded)
        .groupBy($"a", $"b").agg(min($"d").as("d"))
        .localCheckpoint(true)
    }
    val hc = dist.filter($"d" > 0)
      .groupBy($"a").agg(sum(expr("1000000 div d")).as("hc_fp"),
        count(lit(1)).as("n_reach"))
    hc.join(broadcast(Tables.nation(spark, dir)), $"a" === $"n_nationkey")
      .select($"a".cast("long").as("nationkey"), $"n_name", $"n_reach",
        $"hc_fp")
      .orderBy($"hc_fp".desc, $"nationkey")
  }

  private val harmonicOracle = {
    val bfsCtes = (1 to BfsRounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT a, b, CAST(min(d) AS BIGINT) AS d FROM (
         |    SELECT a, b, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT p.a, e.dst AS b, p.d + 1 AS d
         |    FROM d${i - 1} p JOIN edges e ON e.src = p.b) u
         |  GROUP BY a, b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeCtes,
       |d0 AS (SELECT DISTINCT src AS a, src AS b, CAST(0 AS BIGINT) AS d
       |       FROM edges),
       |$bfsCtes,
       |hc AS (
       |  SELECT a, CAST(sum(1000000 // d) AS BIGINT) AS hc_fp,
       |         CAST(count(*) AS BIGINT) AS n_reach
       |  FROM d$BfsRounds WHERE d > 0 GROUP BY a)
       |SELECT CAST(a AS BIGINT) AS nationkey, n.n_name, n_reach, hc_fp
       |FROM hc JOIN nation n ON n.n_nationkey = hc.a
       |ORDER BY hc_fp DESC, nationkey""".stripMargin
  }

  // ---------------------------------------------------------------- x224

  /** x224: Moran's I — does account wealth cluster along trade links?
    * Node attribute x_i = mean customer acctbal per nation quantized
    * to whole dollars FIRST (so deviations are exact integers), trade
    * weights w_ij from the shared edge counts, and
    * I = (N/W)·Σw_ij·dev_i·dev_j / Σdev_i² with dev_i = N·x_i − Σx
    * (the N-scaling cancels between numerator and denominator). Every
    * sum is an exact integer; one spelled-out double division at the
    * end, half-up to 6dp.
    *
    * Scale: a dimension-grain attribute aggregate plus the edge
    * table; the double-sum runs over |E| ≤ |V|² rows of the nation
    * graph. */
  def moransI(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, dir).localCheckpoint(true)
    val attr = Tables.customer(spark, dir)
      .groupBy($"c_nationkey".cast("long").as("nk"))
      .agg(sum(floor($"c_acctbal" + 0.5).cast("long")).as("s"),
        count(lit(1)).as("c"))
      .select($"nk", expr("CAST(floor(CAST(s AS DOUBLE) / CAST(c AS DOUBLE)" +
        " + 0.5) AS BIGINT)").as("x"))
      .localCheckpoint(true)
    val glob = attr.agg(count(lit(1)).as("nn"), sum($"x").as("sx"))
    val dev = attr.crossJoin(broadcast(glob))
      .select($"nk", ($"nn" * $"x" - $"sx").as("dev"))
      .localCheckpoint(true)
    val num = edges
      .join(broadcast(dev.toDF("src", "dev_i")), "src")
      .join(broadcast(dev.toDF("dst", "dev_j")), "dst")
      .agg(sum($"w").as("wsum"), sum($"w" * $"dev_i" * $"dev_j").as("cross_s"))
    val den = dev.agg(sum($"dev" * $"dev").as("ss"))
    num.crossJoin(broadcast(den)).crossJoin(broadcast(glob))
      .select($"wsum",
        expr("CAST(floor(CAST(nn AS DOUBLE) / CAST(wsum AS DOUBLE)" +
          " * CAST(cross_s AS DOUBLE) / CAST(ss AS DOUBLE)" +
          " * 1000000 + 0.5) AS BIGINT)").as("moran_fp"))
  }

  private val moransOracle =
    s"""WITH $tradeCtes,
       |attr AS MATERIALIZED (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
       |         CAST(floor(CAST(sum(CAST(floor(c_acctbal + 0.5) AS BIGINT))
       |             AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS x
       |  FROM customer GROUP BY c_nationkey),
       |g0 AS (SELECT CAST(count(*) AS BIGINT) AS nn,
       |                CAST(sum(x) AS BIGINT) AS sx FROM attr),
       |dev AS MATERIALIZED (
       |  SELECT nk, CAST(nn * x - sx AS BIGINT) AS dev FROM attr, g0),
       |num AS (
       |  SELECT CAST(sum(e.w) AS BIGINT) AS wsum,
       |         CAST(sum(e.w * di.dev * dj.dev) AS BIGINT) AS cross_s
       |  FROM edges e JOIN dev di ON di.nk = e.src JOIN dev dj ON dj.nk = e.dst),
       |den AS (SELECT CAST(sum(dev * dev) AS BIGINT) AS ss FROM dev)
       |SELECT wsum,
       |       CAST(floor(CAST(nn AS DOUBLE) / CAST(wsum AS DOUBLE)
       |         * CAST(cross_s AS DOUBLE) / CAST(ss AS DOUBLE)
       |         * 1000000 + 0.5) AS BIGINT) AS moran_fp
       |FROM num, den, g0""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x223_harmonic_closeness",
      "harmonic closeness centrality via all-pairs unrolled BFS on the nation trade graph: exact integer 1/d sums",
      harmonicCloseness, Some(harmonicOracle)),
    QueryDef("x224_morans_i",
      "Moran's I of mean acctbal over trade adjacency: integer deviations (N-scaled), one final double division",
      moransI, Some(moransOracle)))
}
