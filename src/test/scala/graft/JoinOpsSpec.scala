package graft

import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.functions._

/** Semantics of the temporal join operators on hand-built cases. */
class JoinOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join: strictly-earlier match, null when none, equal-ts excluded") {
    val trades = Seq((1L, "k", 2L), (2L, "k", 3L), (3L, "k", 6L), (4L, "other", 1L))
      .toDF("trade_id", "k", "t")
    val quotes = Seq(("k", 1L, 10.0), ("k", 3L, 30.0), ("k", 5L, 50.0))
      .toDF("k", "qt", "price")
    val out = AsOf.joinPrior(trades, quotes, "k", "t", "qt", Seq("price"))
      .select($"trade_id", $"asof_ts", $"asof_price")
      .orderBy("trade_id")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, Some(1L), Some(10.0)),  // t=2 -> quote@1
      (2L, Some(1L), Some(10.0)),  // t=3 -> quote@1 (STRICT: quote@3 excluded)
      (3L, Some(5L), Some(50.0)),  // t=6 -> quote@5
      (4L, None, None)))           // no quotes for key "other"
  }

  test("as-of join: NULL payload on the matched row is returned, not an older value") {
    // quote@3 has a NULL price: a trade at t=4 must see (ts=3, price=NULL) —
    // carrying ts and payload independently would pair ts=3 with price@1
    val trades = Seq((1L, "k", 4L)).toDF("trade_id", "k", "t")
    val quotes = Seq(("k", 1L, Some(10.0)), ("k", 3L, None))
      .toDF("k", "qt", "price")
    val out = AsOf.joinPrior(trades, quotes, "k", "t", "qt", Seq("price"))
      .select($"trade_id", $"asof_ts", $"asof_price")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq((1L, Some(3L), None)))
  }

  test("range join: pairs within width found exactly once, incl. across bands") {
    val ev = Seq(
      (1L, 10L, 5L), (1L, 11L, 12L),  // gap 7, crosses the 10s band boundary
      (1L, 12L, 14L),                 // 11-12 gap 2 same band; 10-12 gap 9
      (1L, 13L, 40L),                 // isolated
      (2L, 20L, 5L), (2L, 21L, 5L))   // same-second pair, other user
      .toDF("user_id", "event_id", "sec")
      .select($"user_id", $"event_id", timestamp_seconds($"sec").as("ts"))
    val pairs = RangeJoin.withinInterval(ev, "user_id", "event_id", "ts", 10L)
      .select($"a", $"b", $"gap_sec")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L, 7L), (10L, 12L, 9L), (11L, 12L, 2L), (20L, 21L, 0L)))
  }

  test("interval overlap: exactly once per pair incl. multi-band spans, touching counts, disjoint excluded") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 0L, 25L), (2L, 5L, 8L), (3L, 40L, 41L))
      .toDF("lid", "ls", "le") // band width 10: lid=1 spans bands 0..2
    val right = Seq((10L, 7L, 33L), (11L, 25L, 30L), (12L, 35L, 39L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re",
        bandSec = 10L, extraCond = col("lid") >= 0)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq
    // (1,10) overlap 7..25 (shares 3 bands — must appear ONCE);
    // (1,11) touching at 25 counts; (2,10) 7..8; (3,12) disjoint by 1s excluded
    assert(got.sorted == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    assert(got.size == got.toSet.size)
  }

  test("interval overlap: equals the quadratic reference on random intervals, several band widths") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val left = (0 until 40).map { i =>
      val s = rnd.nextInt(500).toLong; (i.toLong, s, s + rnd.nextInt(80))
    }
    val right = (0 until 40).map { i =>
      val s = rnd.nextInt(500).toLong; (100L + i, s, s + rnd.nextInt(80))
    }
    val want = (for {
      (lid, ls, le) <- left
      (rid, rs, re) <- right
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet
    val ldf = left.toDF("lid", "ls", "le")
    val rdf = right.toDF("rid", "rs", "re")
    Seq(7L, 64L, 1000L).foreach { band =>
      val got = RangeJoin.intervalOverlap(ldf, rdf, "ls", "le", "rs", "re",
          band, extraCond = col("lid") >= 0)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"band=$band emitted duplicates")
      assert(got.toSet == want, s"band=$band mismatch")
    }
  }
}
