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

  private def v2Reader(name: String, client: PS.PageClient, endPage: Int, parallelism: Int) = {
    graft.sources.PaginatedTableProvider.registerClient(name, client)
    spark.read.format("graft-pages")
      .option("client", name).option("endpage", endPage).option("parallelism", parallelism)
      .load()
  }

  test("SRC1/DSv2: one InputPartition per page run") {
    val client = new SyntheticPageClient(1000, pageSize = 100)
    assert(v2Reader("dsv2_runs", client, endPage = 10, parallelism = 4)
      .rdd.getNumPartitions == 4)
    // fewer pages than parallelism -> one run per page
    assert(v2Reader("dsv2_runs", client, endPage = 3, parallelism = 8)
      .rdd.getNumPartitions == 3)
  }

  test("SRC1/DSv2: page predicates prune the fetched range at the scan") {
    FetchRecorder.pages.clear()
    val client = new RecordingClient(new SyntheticPageClient(1000, pageSize = 100))
    val df = v2Reader("dsv2_prune", client, endPage = 10, parallelism = 4)
      .filter($"page" >= 4 && $"page" <= 6)
    assert(df.select("value").collect().length == 3)
    // only the surviving run was fetched — the pushed range never saw pages 1-3 or 7-10
    import scala.jdk.CollectionConverters._
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet == Set(4, 5, 6))
  }

  test("SRC1/DSv2: page-only projection never fetches the body") {
    FetchRecorder.pages.clear()
    val client = new RecordingClient(new SyntheticPageClient(1000, pageSize = 100))
    val df = v2Reader("dsv2_prunecols", client, endPage = 10, parallelism = 4).select("page")
    assert(df.count() == 10)
    assert(FetchRecorder.pages.isEmpty)
  }

  test("SRC1/DSv2: LIMIT is pushed into the scan — fetches stop at the limit") {
    FetchRecorder.pages.clear()
    val client = new RecordingClient(new SyntheticPageClient(1000, pageSize = 100))
    val rows = v2Reader("dsv2_limit", client, endPage = 100, parallelism = 4)
      .select("value").limit(3).collect()
    assert(rows.length == 3)
    import scala.jdk.CollectionConverters._
    // pages 4..100 were never fetched — the limit truncated the run itself
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet == Set(1, 2, 3))
    // limit composes with a pushed lower bound: first 2 pages OF the range
    FetchRecorder.pages.clear()
    assert(v2Reader("dsv2_limit2", client, endPage = 100, parallelism = 4)
      .filter($"page" >= 50).select("value").limit(2).collect().length == 2)
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet == Set(50, 51))
    // limit larger than the run is a no-op
    assert(v2Reader("dsv2_limit3", client, endPage = 3, parallelism = 2)
      .limit(10).count() == 3L)
  }

  test("SRC1/DSv2: ungrouped count(*) is answered from page math, zero fetches (A2)") {
    FetchRecorder.pages.clear()
    val client = new RecordingClient(new SyntheticPageClient(1000, pageSize = 100))
    val df = v2Reader("dsv2_cnt", client, endPage = 10, parallelism = 4)
    // the aggregate must actually be IN the scan (not just column-pruned):
    // the pushed-count scan prints its page-math description
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("graft-pages COUNT(*) pages=[1..10]"), plan)
    assert(df.count() == 10L)
    // pushed AFTER the page filters: a pruned range counts the pruned run
    assert(df.filter($"page" >= 4 && $"page" <= 6).count() == 3L)
    assert(FetchRecorder.pages.isEmpty, "count(*) must not fetch any page body")
    // grouped/aggregate shapes the scan can't answer still work (not pushed)
    FetchRecorder.pages.clear()
    assert(v2Reader("dsv2_cnt2", client, endPage = 5, parallelism = 2)
      .groupBy($"page" % 2).count().collect().map(_.getLong(1)).sum == 5L)
  }

  test("S1/DSv2 streaming: row-watermark micro-batches, boundary re-fetch, checkpoint resume") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    // memory sink can't recover a checkpoint; foreachBatch can
    def drive(): Array[org.apache.spark.sql.Row] = {
      StreamCollector.rows.clear()
      val sdf = PS.streamPages(spark, "dsv2_stream",
        new RecordingClient(new GrowableClient(pageSize = 100)),
        startRows = 0, parallelism = 4, pageSize = 100)
      val q = sdf.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(StreamCollector.rows.add)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      StreamCollector.rows.asScala.toArray
    }
    import scala.jdk.CollectionConverters._
    // run 1: 250 rows → pages 1..3 (page 3 partial: 50 of 100 rows)
    GrowableSource.total = 250
    FetchRecorder.pages.clear()
    val b1 = drive()
    assert(b1.map(_.getInt(0)).toSet == Set(1, 2, 3))
    // fetched: the A2 page-1 count probe + the three planned pages
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet == Set(1, 2, 3))
    // run 2 from the same checkpoint: source grew to 420 rows. The committed
    // watermark is 250 → the partial boundary page 3 is RE-fetched (its
    // first 50 rows duplicate run 1 — the reference's deliberate overlap),
    // then pages 4..5; pages 1..2 are not re-read (offset pruning), page 1
    // appears only as the count probe.
    GrowableSource.total = 420
    FetchRecorder.pages.clear()
    val b2 = drive()
    assert(b2.map(_.getInt(0)).toSet == Set(3, 4, 5))
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet == Set(1, 3, 4, 5))
    // exactly-once END TO END: flatten both runs' envelopes, dedup by hash
    // (D1 — the reference's ON DUPLICATE KEY no-op) == one bulk extract
    val all = (b1 ++ b2).map(_.getString(1)).toSeq.toDS()
    val merged = PS.flattenPages(all).dropDuplicates("hash")
    val bulk = PS.bulkExtract(spark, new SyntheticPageClient(420, 100), 4, 100)
    assert(merged.count() == 420)
    assert(merged.select("hash").except(bulk.select("hash")).count() == 0)
    // no new data → an empty micro-batch plan, zero page fetches beyond the probe
    FetchRecorder.pages.clear()
    assert(drive().isEmpty)
    assert(FetchRecorder.pages.asScala.map(_.toInt).toSet.subsetOf(Set(1)))
  }

  test("SRC1/DSv2: flattened output equals the mapPartitions path") {
    val v2 = PS.bulkExtractV2(spark, "dsv2_eq",
      new SyntheticPageClient(250, pageSize = 100), parallelism = 4, pageSize = 100)
    val v1 = PS.bulkExtract(spark, new SyntheticPageClient(250, pageSize = 100),
      parallelism = 4, pageSize = 100)
    assert(v2.count() == 250)
    assert(v2.select("hash").except(v1.select("hash")).count() == 0)
    assert(v1.select("hash").except(v2.select("hash")).count() == 0)
  }
}

/** JVM-wide fetch log: the client instance is serialized into each task, so
  * an instance counter can't observe executor-side fetches even in local
  * mode — a singleton object (per-classloader) can. */
object FetchRecorder {
  val pages: java.util.Set[Integer] = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
}

class RecordingClient(inner: PS.PageClient) extends PS.PageClient {
  def fetchPage(page: Int): String = { FetchRecorder.pages.add(page); inner.fetchPage(page) }
}

/** Mutable row count for the streaming test's growing source — a singleton
  * (per-classloader) for the same reason as [[FetchRecorder]]: the client
  * instance serializes into tasks, so only object state is shared. */
object GrowableSource {
  @volatile var total: Int = 0
}

/** Shared collected-row buffer for the checkpointed foreachBatch drives. */
object StreamCollector {
  val rows: java.util.List[org.apache.spark.sql.Row] =
    java.util.Collections.synchronizedList(new java.util.ArrayList[org.apache.spark.sql.Row]())
}

/** A [[SyntheticPageClient]]-shaped source whose row count follows
  * [[GrowableSource.total]] at fetch time — the append-only API the
  * reference polls incrementally. */
class GrowableClient(pageSize: Int) extends PS.PageClient {
  def fetchPage(page: Int): String =
    new SyntheticPageClient(GrowableSource.total, pageSize).fetchPage(page)
}
