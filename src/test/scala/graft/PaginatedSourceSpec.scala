package graft

import graft.sources.{PaginatedSource => PS, SyntheticPageClient}

/** Connector semantics without network (SURVEY.md §5.4): envelope parse,
  * P1 empty-string defaults, S1 page math + boundary overlap, SRC3 retry. */
class PaginatedSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("SRC1: bulk extract flattens all pages") {
    val client = new SyntheticPageClient(250, pageSize = 100)
    val df = PS.bulkExtract(spark, client, parallelism = 4, pageSize = 100)
    assert(df.count() == 250)
    assert(df.columns.toSeq == Seq("lead_id", "url", "session_id", "order",
      "date", "type_id", "event_category", "event_name", "hash"))
  }

  test("P1: absent keys become empty strings, not nulls; bad dates null") {
    val client = new SyntheticPageClient(120, pageSize = 100)
    val df = PS.bulkExtract(spark, client, parallelism = 2, pageSize = 100)
    // items 0, 53, 106 omit session_id
    assert(df.filter($"session_id" === "").count() == 3)
    assert(df.filter($"session_id".isNull).count() == 0)
    // items 0, 37, 74, 111 have unparseable dates -> null (only nullable col)
    assert(df.filter($"date".isNull).count() == 4)
    // F1: query strings stripped
    assert(df.filter($"event_name".contains("?")).count() == 0)
  }

  test("S1: incremental page math matches max(1, ceil(db/page_size))") {
    assert(PS.incrementalStartPage(0, 2500) == 1)
    assert(PS.incrementalStartPage(1, 2500) == 1)
    assert(PS.incrementalStartPage(2500, 2500) == 1)  // boundary page re-fetched
    assert(PS.incrementalStartPage(2501, 2500) == 2)
    assert(PS.incrementalStartPage(5000, 2500) == 2)
    assert(PS.totalPages(0) == 0)
    assert(PS.totalPages(1) == 1)
    assert(PS.totalPages(5001, 2500) == 3)
  }

  test("S1+SNK1: incremental after partial bulk equals full bulk") {
    val client = new SyntheticPageClient(350, pageSize = 100)
    val firstTwoPages = PS.flattenPages(PS.rawPages(spark, client, 1, 2, 2))
    val dbCount = firstTwoPages.count() // 200
    val merged = PS.incrementalExtract(spark, client, firstTwoPages, dbCount, 2, 100)
    val bulk = PS.bulkExtract(spark, new SyntheticPageClient(350, 100), 2, 100)
    assert(merged.count() == 350)
    assert(merged.select("hash").except(bulk.select("hash")).count() == 0)
  }

  test("S1: no new data short-circuits to existing") {
    val client = new SyntheticPageClient(100, pageSize = 100)
    val existing = Seq(("x", 1)).toDF("hash", "v")
    val out = PS.incrementalExtract(spark, client, existing, dbCount = 100, 2, 100)
    assert(out.collect().toSeq == existing.collect().toSeq)
  }

  test("SRC3: single 401 triggers re-auth + replay; success on retry") {
    val flaky = new SyntheticPageClient(50, pageSize = 100, failFirstFetches = 1)
    var reauths = 0
    val client = new PS.RetryingClient(flaky, () => reauths += 1)
    val json = client.fetchPage(1)
    assert(json.contains("\"count\":50"))
    assert(reauths == 1)
    assert(flaky.fetches == 2)
  }

  test("SRC3: second consecutive 401 propagates (single-retry only)") {
    val dead = new SyntheticPageClient(50, pageSize = 100, failFirstFetches = 2)
    val client = new PS.RetryingClient(dead, () => ())
    intercept[PS.UnauthorizedException](client.fetchPage(1))
  }
}
