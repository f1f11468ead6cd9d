package graft

import graft.operators.Etl
import org.apache.spark.sql.functions._

/** Unit semantics of the reference-core operators (SURVEY.md §2 F1–F4, D1,
  * SNK1) — the edge cases called out in FIXTURES.md. */
class EtlSpec extends SparkTestBase {
  import spark.implicits._

  test("F1+F2: query-string strip + 256 truncation") {
    val long = "x" * 300 + "?utm=1"
    val df = Seq("page_view?utm_source=mail", "plain", "", "a?b?c", long).toDF("n")
      .select(Etl.cleanEventName($"n").as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("page_view", "plain", "", "a", "x" * 256))
  }

  test("F3: 12h-clock parse, null on failure, AM/PM edges") {
    val df = Seq(
      "5/23/2025 7:01:09 PM",
      "12/1/2025 12:00:00 AM", // midnight
      "1/2/2025 12:30:00 PM",  // noon
      "not a date",
      "13/45/2025 99:99:99 XX").toDF("d")
      .select(Etl.parseSfmcDate($"d").cast("string").as("p"))
    assert(df.as[String].collect().toSeq == Seq(
      "2025-05-23 19:01:09",
      "2025-12-01 00:00:00",
      "2025-01-02 12:30:00",
      null, null))
  }

  test("F4: 16-hex hash, stable, null-safe, order-sensitive") {
    val df = Seq(("a", "b"), ("a", null)).toDF("x", "y")
      .select(Etl.contentHash($"x", $"y").as("h"))
    val hs = df.as[String].collect()
    assert(hs.forall(h => h.length == 16 && h.matches("[0-9a-f]{16}")))
    assert(hs(0) != hs(1)) // null coalesces to "" -> different content
    val swapped = Seq(("b", "a")).toDF("x", "y")
      .select(Etl.contentHash($"x", $"y").as("h")).as[String].head()
    assert(swapped != hs(0)) // field order matters (canonical projection)
  }

  test("D1: dedup keeps deterministic first by tie-break") {
    val df = Seq((1L, "h1", "first"), (2L, "h1", "second"), (3L, "h2", "only"))
      .toDF("id", "hash", "tag")
    val out = Etl.dedupByHash(df, "hash", Seq("id")).orderBy("id")
      .select($"id", $"tag").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "first"), (3L, "only")))
  }

  test("SNK1: incremental merge swallows boundary overlap (idempotent)") {
    val existing = Seq(("h1", 1), ("h2", 2)).toDF("hash", "v")
    val incoming = Seq(("h2", 99), ("h3", 3)).toDF("hash", "v") // h2 = overlap
    val merged = Etl.mergeIncremental(existing, incoming)
    val rows = merged.orderBy("hash").as[(String, Int)].collect().toSeq
    assert(rows == Seq(("h1", 1), ("h2", 2), ("h3", 3))) // existing h2 wins
    // re-merging the same batch changes nothing
    val again = Etl.mergeIncremental(merged, incoming)
    assert(again.count() == 3)
  }

  test("property: bulk == incremental page-by-page (reference core invariant)") {
    // Simulate pages of 10 rows with a duplicated boundary row between pages.
    val all = (0 until 95).map(i => (s"h$i", i))
    val bulk = all.toDF("hash", "v")
    val pages = all.grouped(10).toSeq
    val incremental = pages.foldLeft(Seq.empty[(String, Int)].toDF("hash", "v")) {
      (sink, page) =>
        // re-fetch overlap: prepend the previous page's tail like S1 does
        val withOverlap = (page ++ page.headOption).distinct
        Etl.mergeIncremental(sink, withOverlap.toDF("hash", "v"))
    }
    assert(incremental.count() == bulk.count())
    assert(incremental.except(bulk).count() == 0 && bulk.except(incremental).count() == 0)
  }
}
