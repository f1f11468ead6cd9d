package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 twenty-first tier: the minimum spanning tree — the one
  * classic graph family member (Kruskal/Prim/Borůvka; single-linkage
  * clustering's backbone) the graph suite still lacked. The engine side
  * runs BORŮVKA — the canonical distributed MST (each component picks
  * its minimum outgoing edge per round, components contract, O(log n)
  * rounds) — while the oracle runs PRIM as a one-row-state recursive CTE
  * (visited list + ORDER BY/LIMIT 1 step). They are comparable at all
  * because the edge costs are made STRICTLY DISTINCT (cost = w·4096 +
  * a·64 + b, a deterministic perturbation), and a graph with distinct
  * weights has a UNIQUE MST — so two completely different algorithms
  * must emit the identical edge set, which is exactly what the oracle
  * gate then proves.
  */
object Round13Queries21 {

  /** Borůvka rounds (components at least halve per round; 25 nodes
    * converge in ≤ 5). */
  private val BoruvkaRounds = 5
  /** The full nation trade graph with traffic weights and the
    * distinct-cost perturbation. */
  private[graft] def tradeWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Round13Queries13.nationPairCensus(spark, dir)
      .withColumn("d", $"w" * 4096L + $"a" * 64L + $"b")
  }

  private val tradeWeightedSql =
    s"""${Round13Queries13.nationPairCensusSql},
      |edges AS MATERIALIZED (
      |  SELECT a, b, w, w * 4096 + a * 64 + b AS d FROM pairs)""".stripMargin

  /** x355: MST of the trade graph by distributed Borůvka. Per round:
    * contract by labeling nodes with the connected components of the
    * tree built so far (the audited large-star/small-star fixpoint),
    * then every component ranks its outgoing edges by the distinct cost
    * and keeps rank 1 — chosen edges join the tree. Emits the tree edge
    * set (a, b, w); the oracle's sequential Prim must produce the same
    * rows because distinct costs make the MST unique.
    *
    * Scale: each round is one edge-label join, one per-component window
    * rank, and label-frame joins — all hash-partitioned, no global
    * structure; rounds are O(log n) and frames shrink. This is the
    * textbook MapReduce MST shape; the trade graph is nation-grain here
    * but the plan is the one you would run on a billion-edge graph. */
  def mstBoruvka(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = tradeWeighted(spark, dir).localCheckpoint(true)
    val nodes = edges.select($"a".as("node"))
      .unionByName(edges.select($"b".as("node"))).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()
    var mst: DataFrame = null
    var round = 0
    var converged = false
    while (round < BoruvkaRounds && !converged) {
      round += 1
      // contraction = connected components of the tree-so-far: reuses the
      // audited large-star/small-star fixpoint instead of hand-rolled
      // pointer jumping (a first cut chained self-left-joins per jump —
      // Spark has no common-subplan reuse across a self-join, so the
      // EXECUTION tree doubled per jump: 2^k broadcast-subtree runs,
      // 140 s on a 25-node graph)
      val lab =
        if (mst == null) nodes.select($"node", $"node".as("component"))
        else graft.operators.Components.connectedComponentsStars(
          spark, nodes, mst.select($"a", $"b"), "node")
      val el = edges
        .join(lab.select($"node".as("a"), $"component".as("la")), "a")
        .join(lab.select($"node".as("b"), $"component".as("lb")), "b")
        .filter($"la" =!= $"lb")
      val cand = el.select($"la".as("comp"), $"d", $"a", $"b", $"w")
        .unionByName(el.select($"lb".as("comp"), $"d", $"a", $"b", $"w"))
      val pick = cand
        .withColumn("rn", row_number().over(Window.partitionBy($"comp").orderBy($"d")))
        .filter($"rn" === 1)
        .select($"a", $"b", $"w")
        .distinct()
        .localCheckpoint(true)
      mst = if (mst == null) pick
      else mst.unionByName(pick).localCheckpoint(true)
      // Standard Borůvka termination (r16): once the tree SPANS (n−1 edges,
      // connected case) or a round picks no edge (no inter-component edges
      // remain — disconnected case), every later round re-runs the whole
      // components fixpoint + edge-label join to add zero edges. Both
      // counts are one cheap scan of an already-checkpointed frame; the
      // emitted edge set is identical because converged rounds are no-ops
      // (an edge inside a component never passes the la ≠ lb filter).
      converged = pick.isEmpty || mst.count() == nNodes - 1
    }
    mst.select($"a", $"b", $"w").orderBy($"a", $"b")
  }

  private val mstOracle =
    s"""WITH RECURSIVE $tradeWeightedSql,
       |start AS (SELECT min(a) AS s FROM edges),
       |prim AS (
       |  SELECT 0 AS step, [CAST(s AS BIGINT)] AS visited,
       |         CAST(NULL AS BIGINT) AS ea, CAST(NULL AS BIGINT) AS eb,
       |         CAST(NULL AS BIGINT) AS ew
       |  FROM start
       |  UNION ALL
       |  (SELECT p.step + 1,
       |          list_append(p.visited,
       |            CASE WHEN list_contains(p.visited, e.a) THEN e.b ELSE e.a END),
       |          e.a, e.b, e.w
       |   FROM prim p JOIN edges e
       |     ON list_contains(p.visited, e.a) <> list_contains(p.visited, e.b)
       |   ORDER BY e.d LIMIT 1))
       |SELECT ea AS a, eb AS b, ew AS w FROM prim WHERE ea IS NOT NULL
       |ORDER BY a, b""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x355_mst_boruvka",
      "MST by distributed Boruvka vs a sequential recursive-CTE Prim oracle: distinct perturbed costs make the unique MST the meeting point",
      mstBoruvka, Some(mstOracle)))
}
