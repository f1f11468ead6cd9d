package graft

/** Round-14 unit/property specs: the dynamic-gap session merge contract
  * and supporting invariants. */
class Round14Spec extends SparkTestBase {

  test("property: folding ANY batch split through mergeDynSessions equals batch dynamic sessionization") {
    // The dynamic-gap twin of the mergeSessions invariant: each event is
    // its own window [t, t + gap_t]; however the multiset is split into
    // micro-batches (out-of-order, duplicate timestamps, mixed gaps),
    // folding through the pure merge equals from-scratch sessionization on
    // the running max of window ends — including the lag-diff trap where a
    // long-gap event bridges past a short-gap successor.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val eventsGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 300L), Gen.oneOf(3L, 10L, 60L)))
    def batchSessionize(evs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val sorted = evs.map { case (t, g) => (t, t + g) }.sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (s, e) =>
        if (out.nonEmpty && s <= out.last._2) {
          val (ls, le, ln) = out.last
          out(out.size - 1) = (ls, math.max(le, e), ln + 1)
        } else out += ((s, e, 1L))
      }
      out.toSeq
    }
    (1L to 40L).foreach { seed =>
      val evs = sample(eventsGen, seed)
      val nBatches = 1 + (seed % 5).toInt
      val batches = evs.zipWithIndex
        .groupBy { case ((t, _), i) => (t * 31 + i + seed) % nBatches }
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      var state = Array.empty[(Long, Long, Long)]
      batches.foreach { b =>
        state = graft.streaming.IncrementalStream
          .mergeDynSessions(state, b.map { case (t, g) => (t, t + g) }.toArray)
      }
      assert(state.toSeq == batchSessionize(evs),
        s"seed=$seed split into ${batches.size} batches diverged")
    }
  }

  test("mergeDynSessions: a later bridging interval re-merges previously separate sessions") {
    val s1 = graft.streaming.IncrementalStream
      .mergeDynSessions(Array.empty, Array((0L, 10L), (20L, 30L)))
    assert(s1.toSeq == Seq((0L, 10L, 1L), (20L, 30L, 1L)))
    val s2 = graft.streaming.IncrementalStream
      .mergeDynSessions(s1, Array((8L, 22L)))
    assert(s2.toSeq == Seq((0L, 30L, 3L)))
  }
}
