package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 thirteenth tier: the two classic subgraph-density operators
  * the graph suite still lacked — k-TRUSS decomposition (edge peeling by
  * triangle support; the community-core primitive one level finer than
  * x68's k-core) and DENSEST SUBGRAPH via the parallel peeling
  * 2(1+ε)-approximation of Bahmani, Kumar & Vassilvitskii (VLDB 2012),
  * the canonical MapReduce formulation. Both are fixed-round unrolled
  * fixpoints (the x63/x69 contract): every per-round census is BIGINT,
  * density comparisons are cross-multiplied exact rationals, and the
  * oracle walks the identical trajectory as materialized CTEs.
  */
object Round13Queries13 {

  /** Truss parameter: edges must sit in ≥ k−2 = 2 triangles. */
  private val TrussK = 4
  /** Peeling rounds (fixture converges well within; spec asserts the
    * final edge set is an actual fixed point). */
  private val TrussRounds = 4
  /** Bahmani peeling rounds and the 2(1+ε) factor with ε = 0.5 → nodes
    * with deg < 3·m/n are removed each round (integer predicate
    * deg·n < 3m). */
  private val DsgRounds = 8

  /** The heavy-route nation trade graph (x65's edge rule): canonical
    * nation pairs whose lineitem count is ≥ the global mean pair count —
    * sparse enough that 4-truss peeling actually removes edges. */
  /** The weighted nation trade-pair census (a, b, w) — ONE copy shared by
    * x339's heavy-route filter and x355's MST costs (a third hand-rolled
    * copy was an r13 review finding). */
  private[graft] def nationPairCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .select(least($"c_nationkey", $"s_nationkey").cast("long").as("a"),
        greatest($"c_nationkey", $"s_nationkey").cast("long").as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("w"))
  }

  /** Oracle-side rendering of [[nationPairCensus]] (a `pairs AS ...` CTE). */
  private[graft] val nationPairCensusSql =
    """pairs AS MATERIALIZED (
      |  SELECT least(c.c_nationkey, s.s_nationkey) AS a,
      |         greatest(c.c_nationkey, s.s_nationkey) AS b,
      |         CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |  GROUP BY 1, 2)""".stripMargin

  private def heavyTradeEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = nationPairCensus(spark, dir)
    val mean = pairs.agg((sum($"w") * 2L).as("w2"), count(lit(1)).as("np"))
    pairs.crossJoin(broadcast(mean))
      .filter($"w" * $"np" * 2L >= $"w2") // w >= mean, cross-multiplied
      .select($"a", $"b")
  }

  private val heavyTradeEdgesSql =
    s"""$nationPairCensusSql,
      |mean AS (SELECT CAST(sum(w) * 2 AS BIGINT) AS w2, CAST(count(*) AS BIGINT) AS np FROM pairs),
      |e0 AS MATERIALIZED (
      |  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
      |  FROM pairs CROSS JOIN mean WHERE w * np * 2 >= w2)""".stripMargin

  // ---------------------------------------------------------------- x339

  /** x339: 4-truss of the heavy trade graph — repeatedly drop edges that
    * sit in fewer than 2 triangles among the SURVIVING edges, the
    * cohesion core one step stronger than k-core (every truss edge has
    * ≥ k−2 common neighbors inside the truss). Support per round comes
    * from the x64 ordered wedge join (a<b<c finds each triangle once;
    * all three sides are canonical pairs), exploded back to its three
    * edges. [[TrussRounds]] rounds unrolled; the emitted support is
    * RECOMPUTED on the final edge set so the fixed-point property
    * (all supports ≥ k−2) is visible — and spec-asserted.
    *
    * Scale: each round is two hash equi-joins (wedge + closure) and one
    * count — the standard distributed triangle shape; peeling only
    * shrinks the frame. Rounds are checkpointed so the plan stays
    * bounded (x63 rule). */
  def kTruss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var edges = heavyTradeEdges(spark, dir).localCheckpoint(true)
    def support(e: DataFrame): DataFrame = {
      val tri = e.select($"a", $"b")
        .join(e.select($"a".as("bj"), $"b".as("c")), $"b" === $"bj")
        .select($"a", $"b", $"c")
        .join(e.select($"a".as("ta"), $"b".as("tc")),
          $"a" === $"ta" && $"c" === $"tc")
        .select($"a", $"b", $"c")
      tri.select($"a", $"b")
        .unionByName(tri.select($"a", $"c".as("b")))
        .unionByName(tri.select($"b".as("a"), $"c".as("b")))
        .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
    }
    (1 to TrussRounds).foreach { _ =>
      val sup = support(edges)
      edges = edges.join(sup, Seq("a", "b"))
        .filter($"cnt" >= (TrussK - 2).toLong)
        .select($"a", $"b")
        .localCheckpoint(true)
    }
    edges.join(support(edges), Seq("a", "b"), "left")
      .select($"a", $"b", coalesce($"cnt", lit(0L)).as("support"))
      .orderBy($"a", $"b")
  }

  private val kTrussOracle = {
    def round(i: Int): String = {
      val prev = s"e${i - 1}"
      s"""tri$i AS (
         |  SELECT e1.a, e1.b, e2.b AS c
         |  FROM $prev e1 JOIN $prev e2 ON e1.b = e2.a
         |  JOIN $prev e3 ON e3.a = e1.a AND e3.b = e2.b),
         |sup$i AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT a, b FROM tri$i UNION ALL SELECT a, c FROM tri$i
         |        UNION ALL SELECT b, c FROM tri$i) GROUP BY 1, 2),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $prev e
         |  JOIN sup$i s ON s.a = e.a AND s.b = e.b
         |  WHERE s.cnt >= ${TrussK - 2})""".stripMargin
    }
    val rounds = (1 to TrussRounds).map(round).mkString(",\n")
    val fin = TrussRounds
    s"""WITH $heavyTradeEdgesSql,
       |$rounds,
       |triF AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM e$fin e1 JOIN e$fin e2 ON e1.b = e2.a
       |  JOIN e$fin e3 ON e3.a = e1.a AND e3.b = e2.b),
       |supF AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT a, b FROM triF UNION ALL SELECT a, c FROM triF
       |        UNION ALL SELECT b, c FROM triF) GROUP BY 1, 2)
       |SELECT e.a, e.b, coalesce(s.cnt, 0) AS support
       |FROM e$fin e LEFT JOIN supF s ON s.a = e.a AND s.b = e.b
       |ORDER BY e.a, e.b""".stripMargin
  }

  // ---------------------------------------------------------------- x340

  /** The part co-occurrence graph: canonical part pairs appearing in the
    * same order — sparse (orders hold a handful of parts) with genuine
    * degree skew from popular parts, so parallel peeling actually runs
    * several meaningful rounds (the near-complete co-SUPPLY graph is
    * regular: one round kills it). */
  private def coOccurEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val op = Tables.lineitem(spark, dir)
      .select($"l_orderkey".cast("long").as("o"), $"l_partkey".cast("long").as("p"))
      .distinct()
    op.as("x").join(op.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .distinct()
  }

  private val coOccurEdgesSql =
    """op AS MATERIALIZED (
      |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o, CAST(l_partkey AS BIGINT) AS p
      |  FROM lineitem),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT x.p AS a, y.p AS b
      |  FROM op x JOIN op y ON x.o = y.o AND x.p < y.p)""".stripMargin

  /** x340: densest subgraph by parallel peeling (Bahmani et al., VLDB
    * 2012): each round removes EVERY node whose degree is below
    * 2(1+ε)·(m/n) — with ε = 0.5 the integer predicate deg·n < 3m — and
    * keeps the round whose edge/node ratio was highest. O(log n) rounds
    * suffice for the 2(1+ε) = 3-approximation; density ranking is done
    * with CROSS-MULTIPLIED BIGINTs (mᵣ·nₛ vs mₛ·nᵣ), never a double
    * division, so the argmax round (earliest on ties) is exact. Emits
    * the per-round (n, m) trace with the best round flagged.
    *
    * Scale: a round is one degree aggregation plus two semi-join
    * filters — no triangles, no sort; exactly the shape the paper ran
    * on MapReduce. Frames only shrink; rounds are checkpointed. */
  def densestSubgraph(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var edges = coOccurEdges(spark, dir).localCheckpoint(true)
    var trace: DataFrame = null
    (0 until DsgRounds).foreach { r =>
      val m = edges.agg(count(lit(1)).as("m_edges"))
      val n = edges.select($"a".as("node")).unionByName(edges.select($"b".as("node")))
        .distinct().agg(count(lit(1)).as("n_nodes"))
      val row = m.crossJoin(n).select(lit(r.toLong).as("round"), $"n_nodes", $"m_edges")
      trace = if (trace == null) row else trace.unionByName(row)
      val deg = edges.select($"a".as("node")).unionByName(edges.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      val keep = deg.crossJoin(broadcast(row.select($"n_nodes", $"m_edges")))
        .filter($"deg" * $"n_nodes" >= lit(3L) * $"m_edges")
        .select($"node")
      edges = edges
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "leftsemi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "leftsemi")
        .select($"a", $"b")
        .localCheckpoint(true)
    }
    val t = trace.filter($"n_nodes" > 0L).localCheckpoint(true)
    val flagged = t.as("r").join(t.as("s"), lit(true))
      .groupBy(col("r.round").as("round"), col("r.n_nodes").as("n_nodes"),
        col("r.m_edges").as("m_edges"))
      .agg(min(when(col("r.m_edges") * col("s.n_nodes") >=
        col("s.m_edges") * col("r.n_nodes"), 1L).otherwise(0L)).as("is_max"))
    val bestRound = flagged.filter($"is_max" === 1L)
      .agg(min($"round").as("best_round"))
    flagged.crossJoin(broadcast(bestRound))
      .select($"round", $"n_nodes", $"m_edges",
        QueryUtil.halfUp4($"m_edges".cast("double") / $"n_nodes".cast("double")).as("dens"),
        when($"round" === $"best_round", 1L).otherwise(0L).as("best"))
      .orderBy($"round")
  }

  private val densestSubgraphOracle = {
    val rounds = (0 until DsgRounds).map { r =>
      val e = s"e$r"
      s"""stat$r AS (
         |  SELECT CAST($r AS BIGINT) AS round,
         |         (SELECT CAST(count(*) AS BIGINT) FROM
         |            (SELECT DISTINCT node FROM
         |               (SELECT a AS node FROM $e UNION ALL SELECT b FROM $e))) AS n_nodes,
         |         (SELECT CAST(count(*) AS BIGINT) FROM $e) AS m_edges),
         |deg$r AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT a AS node FROM $e UNION ALL SELECT b FROM $e) GROUP BY 1),
         |keep$r AS (
         |  SELECT d.node FROM deg$r d CROSS JOIN stat$r s
         |  WHERE d.deg * s.n_nodes >= 3 * s.m_edges),
         |e${r + 1} AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $e e
         |  WHERE e.a IN (SELECT node FROM keep$r)
         |    AND e.b IN (SELECT node FROM keep$r))""".stripMargin
    }.mkString(",\n")
    val statUnion = (0 until DsgRounds).map(r => s"SELECT * FROM stat$r").mkString(" UNION ALL ")
    s"""WITH $coOccurEdgesSql,
       |$rounds,
       |trace AS (SELECT * FROM ($statUnion) WHERE n_nodes > 0),
       |flagged AS (
       |  SELECT r.round, r.n_nodes, r.m_edges,
       |         min(CASE WHEN r.m_edges * s.n_nodes >= s.m_edges * r.n_nodes
       |                  THEN 1 ELSE 0 END) AS is_max
       |  FROM trace r CROSS JOIN trace s
       |  GROUP BY 1, 2, 3),
       |best AS (SELECT min(round) AS best_round FROM flagged WHERE is_max = 1)
       |SELECT round, n_nodes, m_edges,
       |       floor(CAST(m_edges AS DOUBLE) / CAST(n_nodes AS DOUBLE) * 10000 + 0.5) / 10000.0 AS dens,
       |       CAST(CASE WHEN round = (SELECT best_round FROM best) THEN 1 ELSE 0 END AS BIGINT) AS best
       |FROM flagged ORDER BY round""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x339_ktruss",
      "4-truss edge peeling on the heavy trade graph: per-round triangle support via ordered wedge joins, fixed-point asserted",
      kTruss, Some(kTrussOracle)),
    QueryDef("x340_densest_subgraph",
      "Densest subgraph by Bahmani parallel peeling (VLDB'12) on the part co-occurrence graph: cross-multiplied exact density argmax",
      densestSubgraph, Some(densestSubgraphOracle)))
}
