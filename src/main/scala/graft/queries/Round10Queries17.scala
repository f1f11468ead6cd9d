package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 seventeenth tier: typed-cogroup reconciliation (the
  * KeyValueGroupedDataset API surface as an oracle-paired query),
  * sketch-maintenance-in-motion parity (mergeable HLL state folded per
  * micro-batch stays in the batch sketch's error envelope — with the
  * measured no-bit-identity caveat), and a grouping-sets
  * dataset card (the corpus datasheet governance deliverable). */
object Round10Queries17 {

  /** x171: order/lineitem reconciliation via typed cogroup — the
    * Dataset[T] API surface (KeyValueGroupedDataset.cogroup → a CoGroup
    * physical operator: one shuffle per side, then a partition-local
    * per-key iterator pair) exercised end-to-end: each order key sees its
    * lineitem rows and its orders row TOGETHER and emits a reconciliation
    * verdict — matched / order_without_lineitems / lineitems_without_order
    * — plus exact-cents totals; the query rolls the verdicts up. The
    * oracle recomputes with a full-outer join + aggregate, proving the
    * typed path equals the relational one.
    *
    * Scale: cogroup is exactly the full-outer-join shuffle budget (one
    * exchange per side on the key) with arbitrary per-key logic — the
    * escape hatch for reconciliations too procedural for SQL, at SQL
    * cost. */
  def cogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        floor($"l_extendedprice" * (lit(1) - $"l_discount") * 100 + lit(0.5))
          .cast("long").as("cents"))
      .as[(Long, Long)]
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey",
        floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
      .as[(Long, Long)]
    val rec = li.groupByKey(_._1).cogroup(ord.groupByKey(_._1)) {
      (key, ls, os) =>
        var lsum = 0L; var ln = 0
        ls.foreach { r => lsum += r._2; ln += 1 }
        val osList = os.toList
        val status =
          if (ln == 0) "order_without_lineitems"
          else if (osList.isEmpty) "lineitems_without_order"
          else "matched"
        Iterator((key, status, lsum, osList.map(_._2).sum, ln))
    }.toDF("o_orderkey", "status", "l_cents", "o_cents", "n_lines")
    rec.groupBy($"status")
      .agg(count(lit(1)).as("n_orders"),
        sum($"n_lines").cast("long").as("n_lines"),
        sum($"l_cents").as("l_cents"),
        sum($"o_cents").as("o_cents"),
        sum(abs($"l_cents" - $"o_cents")).as("abs_gap_cents"))
      .orderBy("status")
  }

  private val cogroupReconcileOracle =
    """WITH l AS (SELECT l_orderkey AS k,
      |             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |                  AS BIGINT)) AS BIGINT) AS l_cents,
      |             CAST(count(*) AS BIGINT) AS n_lines
      |           FROM lineitem GROUP BY 1),
      |o AS (SELECT o_orderkey AS k,
      |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_cents
      |      FROM orders),
      |rec AS (SELECT coalesce(l.k, o.k) AS k,
      |          CASE WHEN l.k IS NULL THEN 'order_without_lineitems'
      |               WHEN o.k IS NULL THEN 'lineitems_without_order'
      |               ELSE 'matched' END AS status,
      |          coalesce(l.l_cents, 0) AS l_cents,
      |          coalesce(o.o_cents, 0) AS o_cents,
      |          coalesce(l.n_lines, 0) AS n_lines
      |        FROM l FULL OUTER JOIN o ON l.k = o.k)
      |SELECT status,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(n_lines) AS BIGINT) AS n_lines,
      |       CAST(sum(l_cents) AS BIGINT) AS l_cents,
      |       CAST(sum(o_cents) AS BIGINT) AS o_cents,
      |       CAST(sum(abs(l_cents - o_cents)) AS BIGINT) AS abs_gap_cents
      |FROM rec
      |GROUP BY status
      |ORDER BY status""".stripMargin

  /** x172's sketch precision (q96/x162's lgK) and the x148 slice cuts. */
  private val SkLgK = 12
  private val SecCuts = Seq(1704931200L, 1705795200L)

  /** x172: sketch maintenance in motion — the mergeability property q96
    * proved ACROSS PARTITIONINGS, proven ACROSS TIME: per-day HLL
    * sketches are folded one REAL micro-batch at a time (3 chronological
    * file slices; a day's users can straddle slices, so the fold must
    * union partial day-sketches), and the final streamed state's
    * estimates must stay inside the same 5% envelope as the one-shot
    * batch sketch. MEASURED CAVEAT (sf0.1): union-of-partials is NOT
    * bit-identical to direct aggregation once a day's sketch leaves
    * sparse/coupon mode (~1.3k distinct/day) — the DataSketches union
    * operator's internal state transitions differ — so the honest
    * contract is bounded error, never estimate equality (at
    * sf0.001/0.01 the sketches stay sparse and the estimates happen to
    * coincide; a strict-equality flag passes small SFs and breaks at
    * scale). This is the O(Δ) nightly-stats refresh (q99) as a stream.
    *
    * Scale: state is one O(2^lgK)-byte sketch per day; each micro-batch
    * touches only its own rows. */
  def streamSketchParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_x172").toString
    val ev = Tables.events(spark, dir)
      .select($"user_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        datediff(to_date($"ts"), lit("2024-01-01")).as("dayn"))
      .localCheckpoint(true) // r16: one scan for 3 staged slices + the batch arm
    val bounds = (Long.MinValue +: SecCuts) zip (SecCuts :+ Long.MaxValue)
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      val f = ev.filter($"sec" >= lo && $"sec" < hi)
      f.coalesce(1).write.parquet(s"$base/src/s$i")
      val part = new java.io.File(s"$base/src/s$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.FileSystems.getDefault.getPath(s"$base/src/f$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    // Per-batch partial day-sketches — the state a sketch store keeps —
    // parquet-staged by the executors, never collected (r10 verdict #2).
    val partials = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, stream, base, "append",
        b => b.groupBy(col("dayn"))
          .agg(hll_sketch_agg(col("user_id"), lit(SkLgK)).as("sk")))
    }
    QueryUtil.deleteRecursively(base)
    val streamed = partials.groupBy($"dayn")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_stream"))
    val batch = ev.groupBy($"dayn")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(SkLgK))).as("est_batch"),
        countDistinct($"user_id").as("du_exact"))
    streamed.join(batch, "dayn")
      .select($"dayn", $"du_exact",
        (abs($"est_stream" - $"du_exact") <= $"du_exact" * 0.05)
          .cast("int").as("stream_within_5pct"),
        (abs($"est_batch" - $"du_exact") <= $"du_exact" * 0.05)
          .cast("int").as("batch_within_5pct"))
      .orderBy("dayn")
  }

  private val streamSketchParityOracle =
    """SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS du_exact,
      |       1 AS stream_within_5pct,
      |       1 AS batch_within_5pct
      |FROM events
      |GROUP BY 1
      |ORDER BY dayn""".stripMargin

  /** q109: dataset card — the corpus datasheet a data-governance review
    * reads, produced in ONE grouping-sets pass: per source, per language,
    * per (source × language), and the grand total — doc counts, token
    * mass, exact-duplicate counts (corpus-wide md5 dup flag computed once
    * BEFORE the rollup, so every margin agrees with x10), and mean doc
    * length. GROUPING() bits disambiguate the margin rows (a NULL group
    * value never masquerades as a data value).
    *
    * Scale: the dup flag is one hash shuffle (x10's shape); the rollup is
    * a single Expand + aggregate — four margins for one scan. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"lang", $"n_chars",
        size(split($"text", " ")).cast("long").as("n_tok"),
        md5($"text").as("h"))
    val dup = d.groupBy($"h").agg(count(lit(1)).as("copies"))
    // cube(source, lang) = exactly the four grouping sets the card wants
    d.join(dup, "h")
      .cube($"source", $"lang")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("tokens"),
        sum(when($"copies" > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        QueryUtil.halfUp4(avg($"n_chars")).as("mean_chars"))
      .select($"gid".cast("int").as("gid"),
        coalesce($"source", lit("ALL")).as("source"),
        coalesce($"lang", lit("ALL")).as("lang"),
        $"n_docs", $"tokens", $"n_dup_docs", $"mean_chars")
      .orderBy("gid", "source", "lang")
  }

  private val datasetCardOracle =
    """WITH d AS (SELECT doc_id, source, lang, n_chars,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |             md5(text) AS h
      |           FROM documents),
      |dup AS (SELECT h, count(*) AS copies FROM d GROUP BY h),
      |j AS (SELECT d.*, dup.copies FROM d JOIN dup USING (h))
      |SELECT CAST(GROUPING(source) * 2 + GROUPING(lang) AS INTEGER) AS gid,
      |       coalesce(source, 'ALL') AS source,
      |       coalesce(lang, 'ALL') AS lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS tokens,
      |       CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
      |       floor(avg(n_chars) * 10000 + 0.5) / 10000.0 AS mean_chars
      |FROM j
      |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
      |ORDER BY gid, source, lang""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x171_cogroup_reconcile",
      "typed KeyValueGroupedDataset.cogroup reconciliation of orders vs lineitems == full-outer-join oracle",
      cogroupReconcile, Some(cogroupReconcileOracle)),
    QueryDef("x172_stream_sketch_parity",
      "HLL day-sketches folded per real micro-batch stay in the batch 5% envelope (mergeability across time; bit-identity dies with sparse mode)",
      streamSketchParity, Some(streamSketchParityOracle)),
    QueryDef("q109_dataset_card",
      "grouping-sets corpus datasheet: docs/tokens/exact-dup counts/mean length per source, lang, both, and total",
      datasetCard, Some(datasetCardOracle)))
}
