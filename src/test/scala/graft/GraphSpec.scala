package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Unit semantics of the exact-integer PageRank operator. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

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

  test("pageRank weights split proportionally to edge weight") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    // 1 splits 3:1 to {2,3}; 2 and 3 return everything to 1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(nodes, edges, 8).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L))
    assert(r(1L) > r(2L))
  }
}
