package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Unit semantics of the exact-integer PageRank operator. */
class GraphSpec extends SparkTestBase {

  test("mergeDeltaEdges: seeded merge matches recompute and converges faster on a long chain") {
    import spark.implicits._
    // two 100-node chains; the delta edge joins them into one 200-node chain
    val chainA = (0 until 99).map(i => (i.toLong, (i + 1).toLong))
    val chainB = (100 until 199).map(i => (i.toLong, (i + 1).toLong))
    val base = (chainA ++ chainB).toDF("a", "b")
    val delta = Seq((99L, 100L)).toDF("a", "b")
    val nodes = (0L to 199L).toDF("node")
    val (full, fullRounds) = graft.operators.Components
      .connectedComponentsStarsWithRounds(spark, nodes, base.unionByName(delta), "node")
    val stored = graft.operators.Components
      .connectedComponentsStars(spark, nodes, base, "node")
    val (merged, mergeRounds) = graft.operators.Components
      .mergeDeltaEdges(spark, stored, delta, "node")
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty)
    assert(merged.select("component").distinct().count() == 1L)
    // the whole point: seeding from labels beats recomputing the chain
    assert(mergeRounds < fullRounds,
      s"merge took $mergeRounds rounds vs full $fullRounds")
  }
  import spark.implicits._

  test("stars convergence probe: chain-only and multi-parent-only non-star shapes both keep the loop running") {
    // r16 fused the two-job notStar check (semi-join count + groupBy count)
    // into one census aggregation; these are the two shapes where exactly
    // ONE conjunct is violated, so an under-counting fusion would exit the
    // loop early and mislabel.
    // chain 3→2→1: no multi-parent src, but dst 2 is itself a src.
    val nodesC = Seq(1L, 2L, 3L).toDF("node")
    val chain = Seq((3L, 2L), (2L, 1L)).toDF("a", "b")
    val (labC, roundsC) = graft.operators.Components
      .connectedComponentsStarsWithRounds(spark, nodesC, chain, "node")
    assert(roundsC >= 1, "chain shape must not read as an initial star forest")
    assert(labC.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // multi-parent: 5→1 and 5→2 — no dst is a src, but src 5 has two parents
    // (the latent shape the unique-parent conjunct exists for).
    val nodesM = Seq(1L, 2L, 5L).toDF("node")
    val multi = Seq((5L, 1L), (5L, 2L)).toDF("a", "b")
    val (labM, roundsM) = graft.operators.Components
      .connectedComponentsStarsWithRounds(spark, nodesM, multi, "node")
    assert(roundsM >= 1, "multi-parent shape must not read as an initial star forest")
    assert(labM.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    // and a genuine star forest converges with zero rounds
    val nodesS = Seq(1L, 2L, 3L, 7L).toDF("node")
    val star = Seq((2L, 1L), (3L, 1L)).toDF("a", "b")
    val (_, roundsS) = graft.operators.Components
      .connectedComponentsStarsWithRounds(spark, nodesS, star, "node")
    assert(roundsS == 0, s"star forest should take 0 rounds, took $roundsS")
  }

  test("pageRank conserves mass up to flooring dust on a strongly connected graph") {
    // 3-cycle a->b->c->a, unit weights: symmetric roles, rank ~ 1/3 each.
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, 5).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    // exact symmetry: identical in-flows => identical fixed-point values
    assert(r.values.toSet.size == 1)
    val total = r.values.sum
    // each iteration floors ≤ 1 unit per edge + base per node: dust is tiny
    assert(total <= Graph.MassFp && total > Graph.MassFp - 100)
  }

  test("pageRank favors the node every other node points at") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    // star into node 1; node 1 spreads back uniformly
    val edges = Seq((2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L),
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, 10).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
  }

  test("pageRank redistributes dangling mass uniformly") {
    // 1 -> 2, and node 2 has NO out-edges: without the dangling correction
    // node 2's inflow mass would leak out of the system each round.
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, 5).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val total = r(1L) + r(2L)
    assert(total > Graph.MassFp - 100, s"mass leaked: $total")
    assert(r(2L) > r(1L)) // 2 receives 1's full damped flow plus its share
  }

  test("kCore peels shells to the dense core") {
    // triangle {1,2,3} (2-core) with a tail 3-4-5 (1-core only)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val core2 = Graph.kCore(edges, 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val core1 = Graph.kCore(edges, 1).collect().map(_.getLong(0)).toSet
    assert(core1 == Set(1L, 2L, 3L, 4L, 5L))
    // K4 is a 3-core; attaching a pendant to each corner doesn't save them at k=3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("a", "b")
    val core3 = Graph.kCore(k4, 3).collect().map(_.getLong(0)).toSet
    assert(core3 == Set(1L, 2L, 3L, 4L))
    // cascade: a chain 1-2-3-...-6 fully dissolves at k=2 (ends peel first,
    // exposing new ends each round) -> empty result
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    assert(Graph.kCore(chain, 2).count() == 0)
  }

  test("pageRank weights split proportionally to edge weight") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    // 1 splits 3:1 to {2,3}; 2 and 3 return everything to 1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, 8).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L))
    assert(r(1L) > r(2L))
  }

  test("bfsHops finds minimum hop counts, ignores longer alternates, stops at unreachable") {
    // 1 -> 2 -> 3 -> 4 plus a shortcut 1 -> 3; node 9 is disconnected,
    // node 5 only reaches INTO the component (no path from the source).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 4L)).toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val h = Graph.bfsHops(src, edges).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2)) // 3 via shortcut, not 1-2-3
    // multi-source: nearest source wins
    val h2 = Graph.bfsHops(Seq(1L, 4L).toDF("node"), edges).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h2(4L) == 0 && h2(3L) == 1 && h2(2L) == 1)
    // a source with no edges at all is still reported at hop 0
    val h3 = Graph.bfsHops(Seq(9L).toDF("node"), edges).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(h3 == Map(9L -> 0))
  }

  test("sssp relaxes to true weighted shortest paths, not fewest hops") {
    // 1->2->3 costs 1+1=2, direct 1->3 costs 5: the 2-hop path must win.
    // 4 is reachable only via 3 (+10); 9 is unreachable and must be absent.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 10L),
      (9L, 1L, 1L)).toDF("src", "dst", "w")
    val d = Graph.sssp(Seq(1L).toDF("node"), edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 12L))
    // multi-source: per-node min over sources; a better seed lowers 4
    val d2 = Graph.sssp(Seq(1L, 3L).toDF("node"), edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(3L) == 0L && d2(4L) == 10L && d2(2L) == 1L)
    // negative-free fixpoint must terminate on cycles
    val cyc = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val d3 = Graph.sssp(Seq(1L).toDF("node"), cyc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L))
  }

  test("hits ranks hubs by outflow into strong authorities, exactly") {
    // Bipartite: hubs {1,2} -> authorities {10, 20}.
    // 1 points at both authorities, 2 only at 10; 10 has in-degree 2.
    val edges = Seq((1L, 10L, 1L), (1L, 20L, 1L), (2L, 10L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.hits(edges, 2).collect()
      .map(x => x.getLong(0) -> ((BigDecimal(x.getDecimal(1)), BigDecimal(x.getDecimal(2)))))
      .toMap
    // Hand-computed unnormalized trajectory (h0 = 1):
    // a1: 10 -> 2, 20 -> 1;  h1: 1 -> 3, 2 -> 2
    // a2: 10 -> 5, 20 -> 3;  h2: 1 -> 8, 2 -> 5
    assert(r(10L) == ((BigDecimal(5), BigDecimal(0))))
    assert(r(20L) == ((BigDecimal(3), BigDecimal(0))))
    assert(r(1L) == ((BigDecimal(0), BigDecimal(8))))
    assert(r(2L) == ((BigDecimal(0), BigDecimal(5))))
    // weights scale contributions linearly: doubling 2->10 doubles 2's
    // stake in authority 10
    val w2 = Seq((1L, 10L, 1L), (1L, 20L, 1L), (2L, 10L, 2L))
      .toDF("src", "dst", "w")
    val rw = Graph.hits(w2, 1).collect()
      .map(x => x.getLong(0) -> ((BigDecimal(x.getDecimal(1)), BigDecimal(x.getDecimal(2)))))
      .toMap
    // a1: 10 -> 1+2 = 3, 20 -> 1; h1: 1 -> 3+1 = 4, 2 -> 2*3 = 6
    assert(rw(10L)._1 == BigDecimal(3) && rw(20L)._1 == BigDecimal(1))
    assert(rw(1L)._2 == BigDecimal(4) && rw(2L)._2 == BigDecimal(6))
  }
}
