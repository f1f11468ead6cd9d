package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 second tier: the table-statistics family that q95/q96 opened
  * (mergeable histograms, MCV-aware cardinality estimation, incremental
  * ANALYZE), completing the metadata layer a 100 TB lakehouse keeps per
  * partition — every statistic here is either exactly mergeable or
  * sketch-mergeable, so stats maintenance is an O(partitions-touched)
  * incremental job, never a table rescan. */
object Round10Queries2 {

  /** Fixed equi-width bin for q97 — bin edges are CONSTANTS (the two-pass
    * ANALYZE convention: min/max first, then bin), so per-partition
    * histograms are register-compatible under any partitioning. */
  private val HistWidth = 25000.0

  /** q97: mergeable equi-width histograms — the q96 counterpart for value
    * DISTRIBUTIONS. Per-partition histograms with shared constant bin
    * edges merge EXACTLY (bin counts sum — associative, commutative,
    * partition-shape-free), unlike exact NDV (q95's inflation) and unlike
    * the HLL estimate (q96's 2.5% cross-partitioning wobble). Two
    * maximally-different partitionings (5 priority groups vs 64 orderkey
    * hash buckets) are each histogrammed per-partition then merged; the
    * per-bin `merge_exact` flag asserts bitwise equality of the two merged
    * histograms. The histogram's own p50 estimate (linear interpolation
    * inside the median bin) lands within one bin width of the exact
    * interpolated median — `p50_within_bin` (the error bound a
    * histogram-based optimizer quotes).
    *
    * Scale: the per-partition state is O(bins) integers regardless of
    * partition size; the merge is one |bins|-row shuffle. This is the
    * selectivity-estimation stat (q94's input) maintained incrementally. */
  def histogramMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
        floor($"o_totalprice" / HistWidth).cast("long").as("bin"))
    // partitioning A: 5 priority partitions -> per-partition histograms -> merge
    val mergedA = o.groupBy($"o_orderpriority", $"bin")
      .agg(count(lit(1)).as("c"))
      .groupBy($"bin").agg(sum($"c").as("cnt_a"))
    // partitioning B: 64 hash buckets of the key -> same merge
    val mergedB = o.groupBy(pmod(hash($"o_orderkey"), lit(64)).as("bk"), $"bin")
      .agg(count(lit(1)).as("c"))
      .groupBy($"bin").agg(sum($"c").as("cnt_b"))
    val n = o.agg(count(lit(1)).as("n"),
      percentile($"o_totalprice", lit(0.5)).as("p50_exact"))
    val w = Window.orderBy($"bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = mergedA.join(mergedB, Seq("bin"), "full_outer")
      .select($"bin",
        coalesce($"cnt_a", lit(0L)).as("cnt_a"),
        coalesce($"cnt_b", lit(0L)).as("cnt_b"))
      .withColumn("cum", sum($"cnt_a").over(w))
      .crossJoin(broadcast(n))
    // median bin: first bin whose cumulative count reaches n/2
    // (all arithmetic in DOUBLE, same op order as the oracle)
    val est = hist
      .filter(($"cum" - $"cnt_a") < $"n".cast("double") * 0.5 &&
        $"cum" >= $"n".cast("double") * 0.5)
      .select((lit(HistWidth) * $"bin" +
        lit(HistWidth) * (($"n".cast("double") * 0.5 - ($"cum" - $"cnt_a")) / $"cnt_a"))
        .as("p50_est"))
    hist.crossJoin(broadcast(est))
      .select($"bin", $"cnt_a", $"cnt_b",
        ($"cnt_a" === $"cnt_b").cast("int").as("merge_exact"),
        $"cum",
        halfUp4($"p50_est").as("p50_est"),
        (abs($"p50_est" - $"p50_exact") <= lit(HistWidth)).cast("int").as("p50_within_bin"))
      .orderBy("bin")
  }

  private val histogramMergeOracle =
    s"""WITH h AS (SELECT CAST(floor(o_totalprice / $HistWidth) AS BIGINT) AS bin,
       |                  CAST(count(*) AS BIGINT) AS cnt
       |           FROM orders GROUP BY 1),
       |c AS (SELECT bin, cnt,
       |        CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
       |        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n
       |      FROM h),
       |med AS (SELECT $HistWidth * bin + $HistWidth * ((CAST(n AS DOUBLE) * 0.5 - (cum - cnt)) / cnt) AS p50_est
       |        FROM c WHERE (cum - cnt) < CAST(n AS DOUBLE) * 0.5 AND cum >= CAST(n AS DOUBLE) * 0.5),
       |ex AS (SELECT quantile_cont(o_totalprice, 0.5) AS p50_exact FROM orders)
       |SELECT c.bin, c.cnt AS cnt_a, c.cnt AS cnt_b, 1 AS merge_exact, c.cum,
       |       floor(med.p50_est * 10000 + 0.5) / 10000.0 AS p50_est,
       |       CAST(abs(med.p50_est - ex.p50_exact) <= $HistWidth AS INTEGER) AS p50_within_bin
       |FROM c, med, ex
       |ORDER BY c.bin""".stripMargin

  /** q98: MCV-aware join-cardinality estimation — the q94 estimator
    * upgraded with the most-common-values statistic every real optimizer
    * keeps (Postgres MCV lists, Spark CBO histogram stats). On the skewed
    * `documents.lang` self-equi-join (en is ~3x any other language), the
    * naive |R|·|S|/NDV uniform formula underestimates badly; pulling the
    * top-2 MCVs out (their contribution f² is exact) and applying the
    * uniform formula only to the residual cuts the relative error from
    * ~26% to under 1% at sf0.01. Emits both estimates, the true
    * cardinality, and the win flag — the evidence a planner needs to
    * justify the extra stats bytes.
    *
    * Scale: the MCV list is a top-K aggregate (map-side partial, K rows
    * kept per partition); the estimate itself is O(K) arithmetic on the
    * driver-side stats row, never touching data. */
  def mcvJoinCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("f"))
    val ranked = freq.withColumn("rk",
      row_number().over(Window.orderBy($"f".desc, $"lang")))
    val stats = ranked.agg(
      sum($"f").as("n"),
      count(lit(1)).as("ndv"),
      sum($"f" * $"f").as("actual"),
      sum(when($"rk" <= 2, $"f" * $"f").otherwise(0L)).as("mcv_sq"),
      sum(when($"rk" <= 2, $"f").otherwise(0L)).as("mcv_n"))
    stats.select(
      $"n", $"ndv", $"actual",
      halfUp4($"n".cast("double") * $"n" / $"ndv").as("naive_est"),
      halfUp4($"mcv_sq" +
        ($"n" - $"mcv_n").cast("double") * ($"n" - $"mcv_n") / ($"ndv" - 2)).as("mcv_est"),
      halfUp4(abs($"n".cast("double") * $"n" / $"ndv" - $"actual") / $"actual").as("naive_rel_err"),
      halfUp4(abs($"mcv_sq" +
        ($"n" - $"mcv_n").cast("double") * ($"n" - $"mcv_n") / ($"ndv" - 2) - $"actual") / $"actual")
        .as("mcv_rel_err"))
      .withColumn("mcv_wins", ($"mcv_rel_err" < $"naive_rel_err").cast("int"))
      .orderBy("n")
  }

  private val mcvJoinCardOracle =
    """WITH f AS (SELECT lang, CAST(count(*) AS BIGINT) AS f FROM documents GROUP BY 1),
      |r AS (SELECT lang, f, row_number() OVER (ORDER BY f DESC, lang) AS rk FROM f),
      |s AS (SELECT CAST(sum(f) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS ndv,
      |             CAST(sum(f * f) AS BIGINT) AS actual,
      |             CAST(sum(CASE WHEN rk <= 2 THEN f * f ELSE 0 END) AS BIGINT) AS mcv_sq,
      |             CAST(sum(CASE WHEN rk <= 2 THEN f ELSE 0 END) AS BIGINT) AS mcv_n
      |      FROM r),
      |e AS (SELECT n, ndv, actual,
      |        CAST(n AS DOUBLE) * n / ndv AS naive_raw,
      |        mcv_sq + CAST(n - mcv_n AS DOUBLE) * (n - mcv_n) / (ndv - 2) AS mcv_raw
      |      FROM s)
      |SELECT n, ndv, actual,
      |       floor(naive_raw * 10000 + 0.5) / 10000.0 AS naive_est,
      |       floor(mcv_raw * 10000 + 0.5) / 10000.0 AS mcv_est,
      |       floor(abs(naive_raw - actual) / actual * 10000 + 0.5) / 10000.0 AS naive_rel_err,
      |       floor(abs(mcv_raw - actual) / actual * 10000 + 0.5) / 10000.0 AS mcv_rel_err,
      |       CAST(floor(abs(mcv_raw - actual) / actual * 10000 + 0.5) / 10000.0
      |            < floor(abs(naive_raw - actual) / actual * 10000 + 0.5) / 10000.0 AS INTEGER) AS mcv_wins
      |FROM e
      |ORDER BY n""".stripMargin

  /** q99: incremental ANALYZE — the maintenance identity the q95–q97
    * family builds to: for a base partition T (orders before 1996) and a
    * delta Δ (1996 onward), merge(stats(T), stats(Δ)) must equal
    * stats(T ∪ Δ) per group WITHOUT rescanning T. count/sum/min/max merge
    * exactly (emitted as per-group equality flags, computed by really
    * running both sides); NDV merges through the q96 HLL union and lands
    * within the 5% sketch bound of the exact union NDV. This is the stats
    * refresh a 100 TB table runs on every ingest batch: O(|Δ|) scan plus
    * an O(groups) merge, where the naive recompute is O(|T|+|Δ|).
    *
    * Scale: both stats frames are tiny (|groups| rows); the merge is a
    * broadcast join. The delta scan partition-prunes on the date predicate
    * (o_orderdate >= cut reaches the parquet scan). */
  def incrementalStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = "1996-01-01"
    val o = Tables.orders(spark, dir).select($"o_orderpriority", $"o_custkey",
      $"o_orderdate", floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    def stats(df: DataFrame, tag: String): DataFrame =
      df.groupBy($"o_orderpriority").agg(
        count(lit(1)).as(s"cnt_$tag"),
        sum($"cents").as(s"sum_$tag"),
        min($"cents").as(s"min_$tag"),
        max($"cents").as(s"max_$tag"),
        hll_sketch_agg($"o_custkey", lit(12)).as(s"sk_$tag"))
    val t = stats(o.filter($"o_orderdate" < cut), "t")
    val d = stats(o.filter($"o_orderdate" >= cut), "d")
    val full = o.groupBy($"o_orderpriority").agg(
      count(lit(1)).as("n_full"),
      sum($"cents").as("sum_full"),
      min($"cents").as("min_full"),
      max($"cents").as("max_full"),
      countDistinct($"o_custkey").as("ndv_exact"))
    t.join(d, Seq("o_orderpriority"), "full_outer")
      .select($"o_orderpriority",
        (coalesce($"cnt_t", lit(0L)) + coalesce($"cnt_d", lit(0L))).as("cnt_m"),
        (coalesce($"sum_t", lit(0L)) + coalesce($"sum_d", lit(0L))).as("sum_m"),
        least($"min_t", $"min_d").as("min_m"), // least/greatest skip nulls
        greatest($"max_t", $"max_d").as("max_m"),
        hll_sketch_estimate(hll_union($"sk_t", $"sk_d", allowDifferentLgConfigK = true)).as("ndv_m"))
      .join(full, Seq("o_orderpriority"))
      .select($"o_orderpriority", $"n_full", $"sum_full", $"min_full", $"max_full",
        ($"cnt_m" === $"n_full").cast("int").as("cnt_merge_eq"),
        ($"sum_m" === $"sum_full").cast("int").as("sum_merge_eq"),
        ($"min_m" === $"min_full").cast("int").as("min_merge_eq"),
        ($"max_m" === $"max_full").cast("int").as("max_merge_eq"),
        $"ndv_exact",
        (abs($"ndv_m" - $"ndv_exact") <= $"ndv_exact" * 0.05).cast("int").as("ndv_within"))
      .orderBy("o_orderpriority")
  }

  private val incrementalStatsOracle =
    """WITH o AS (SELECT o_orderpriority, o_custkey,
      |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |           FROM orders)
      |SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_full,
      |       CAST(sum(cents) AS BIGINT) AS sum_full,
      |       min(cents) AS min_full,
      |       max(cents) AS max_full,
      |       1 AS cnt_merge_eq, 1 AS sum_merge_eq, 1 AS min_merge_eq, 1 AS max_merge_eq,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_exact,
      |       1 AS ndv_within
      |FROM o
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** x135: duplicated-n-gram mass — the span-level dedup MEASUREMENT from
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (exact-substring dedup, approximated at fixed n=8-token
    * granularity): an 8-gram instance is duplicated when its corpus-wide
    * instance count is >= 2 (within-doc repetition counts — boilerplate
    * repeats inside one page too). Per document: total 8-gram instances,
    * duplicated instances, the duplicated fraction, and the keep gate at
    * raw fraction <= 0.5 (the sf0.01 corpus is cleanly bimodal: 453 docs
    * near 0, the 47 template near-dups at 0.8–1.0). Documents shorter
    * than 8 tokens carry zero grams and pass trivially.
    *
    * Scale: two hash shuffles (gram totals, per-doc rollup) — at 100 TB
    * the gram key would be xxhash64'd to 8 bytes before the exchange
    * (collision odds ~(corpus grams)²/2⁶⁵ — acceptable for a filter
    * stat); the explode is array-local and the gram totals aggregate is
    * map-side partial. No all-pairs stage anywhere. */
  def dupNgramMass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val G = 8
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    // native one-pass 8-grams (r16): the interpreted transform() lambda
    // re-ran slice+concat per element; token_ngrams emits the identical
    // list and returns [] for docs shorter than G (the old when() guard)
    val grams = docs
      .select($"doc_id",
        explode(call_function("token_ngrams", $"text", lit(G))).as("gram"))
    val cd = grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("c"))
    val ct = cd.groupBy($"gram").agg(sum($"c").as("total"))
    val perDoc = cd.join(ct, "gram")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"),
        sum(when($"total" >= 2, $"c").otherwise(0L)).as("n_dup"))
    docs.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_dup", lit(0L)).as("n_dup"))
      .withColumn("raw", when($"n_grams" > 0,
        $"n_dup".cast("double") / $"n_grams").otherwise(lit(0.0)))
      .select($"doc_id", $"n_grams", $"n_dup",
        halfUp4($"raw").as("dup_frac"),
        ($"raw" <= 0.5).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  private val dupNgramMassOracle =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id,
      |        array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER) + 7], ' ') AS gram
      |      FROM t, LATERAL unnest(range(1, greatest(len(toks) - 6, 1))) AS u(i)
      |      WHERE len(toks) >= 8),
      |cd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      |ct AS (SELECT gram, CAST(sum(c) AS BIGINT) AS total FROM cd GROUP BY 1),
      |d AS (SELECT cd.doc_id,
      |        CAST(sum(cd.c) AS BIGINT) AS n_grams,
      |        CAST(sum(CASE WHEN ct.total >= 2 THEN cd.c ELSE 0 END) AS BIGINT) AS n_dup
      |      FROM cd JOIN ct USING (gram) GROUP BY 1),
      |f AS (SELECT t.doc_id,
      |        coalesce(d.n_grams, 0) AS n_grams, coalesce(d.n_dup, 0) AS n_dup,
      |        CASE WHEN coalesce(d.n_grams, 0) > 0
      |             THEN CAST(d.n_dup AS DOUBLE) / d.n_grams ELSE 0.0 END AS raw
      |      FROM t LEFT JOIN d ON d.doc_id = t.doc_id)
      |SELECT doc_id, n_grams, n_dup,
      |       floor(raw * 10000 + 0.5) / 10000.0 AS dup_frac,
      |       CAST(raw <= 0.5 AS INTEGER) AS keep
      |FROM f
      |ORDER BY doc_id""".stripMargin

  /** x136: quality-aware survivor selection — x14 labels near-dup
    * clusters; the naive canonical is the min doc_id (x14's
    * `is_canonical`). A training pipeline should instead KEEP THE BEST
    * COPY: per multi-member cluster, the survivor is the member
    * maximizing the x42 quality score (raw, unrounded — the ranking-key
    * rule), doc_id ascending as the deterministic tie-break. Emits the
    * chosen survivor, the naive min-id survivor's quality, and the
    * quality gain — the measured value of quality-aware
    * canonicalization over id-order canonicalization.
    *
    * Scale: rides x14's audited components pipeline (banded LSH
    * candidates + pointer-jumping, both subquadratic); the quality score
    * is array-local per doc and the argmax is one window over
    * |cluster members| rows. */
  def survivorQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clusters = DedupQueries.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster_id")
    val toks = graft.operators.TextAnalysis.tokens($"text")
    val quality = Tables.documents(spark, dir)
      .select($"doc_id", graft.operators.TextAnalysis.qualityScore(toks).as("q"))
    val members = clusters.join(quality, "doc_id")
    val multi = members
      .withColumn("csize", count(lit(1)).over(Window.partitionBy($"cluster_id")))
      .filter($"csize" >= 2)
    val ranked = multi.withColumn("rk",
      row_number().over(Window.partitionBy($"cluster_id").orderBy($"q".desc, $"doc_id")))
    val naive = multi.filter($"doc_id" === $"cluster_id") // min-id member IS the label
      .select($"cluster_id", $"q".as("naive_q"))
    ranked.filter($"rk" === 1)
      .join(naive, "cluster_id")
      .select($"cluster_id", $"csize".as("n_members"),
        $"doc_id".as("survivor_doc"),
        halfUp4($"q").as("survivor_quality"),
        halfUp4($"naive_q").as("naive_quality"),
        halfUp4($"q" - $"naive_q").as("quality_gain"))
      .orderBy("cluster_id")
  }

  private val survivorQualityOracle = {
    import graft.operators.TextAnalysis
    DedupQueries.clustersOracleCtes +
      s""",
         |qual AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql("string_split(text, ' ')")} AS q
         |         FROM documents),
         |mem AS (SELECT l.doc_id, l.cluster_id, qual.q,
         |          count(*) OVER (PARTITION BY l.cluster_id) AS csize
         |        FROM labeled l JOIN qual ON qual.doc_id = l.doc_id),
         |multi AS (SELECT * FROM mem WHERE csize >= 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rk
         |       FROM multi),
         |naive AS (SELECT cluster_id, q AS naive_q FROM multi WHERE doc_id = cluster_id)
         |SELECT r.cluster_id, CAST(r.csize AS BIGINT) AS n_members,
         |       r.doc_id AS survivor_doc,
         |       floor(r.q * 10000 + 0.5) / 10000.0 AS survivor_quality,
         |       floor(n.naive_q * 10000 + 0.5) / 10000.0 AS naive_quality,
         |       floor((r.q - n.naive_q) * 10000 + 0.5) / 10000.0 AS quality_gain
         |FROM rk r JOIN naive n ON n.cluster_id = r.cluster_id
         |WHERE r.rk = 1
         |ORDER BY r.cluster_id""".stripMargin
  }

  /** x133 cohort bound — sessions of the first 40 users; the streaming
    * state (complete-mode session store) stays a few hundred rows at
    * every SF while still covering thousands of events. */
  private val SessUsers = 40

  /** x133: streaming session-window batch parity — the driver-visible
    * oracle pair for `IncrementalStream.sessionCounts` (the X6 streaming
    * variant, spec-only until now; the same closure x117 gave the top-k
    * stream and x132 gave the paginated source). The events cohort is
    * staged to parquet files and REALLY streamed (file source,
    * maxFilesPerTrigger=1, AvailableNow), so the session store merges
    * windows across micro-batches — including sessions whose events are
    * split across files, the case that exercises cross-batch session
    * MERGE state. The final complete-mode emission must equal classic
    * batch lag-gap sessionization recomputed from scratch by the oracle.
    * Timestamps are second-truncated on both sides (q22's convention —
    * the fixture is TIMESTAMP(NANOS); Spark reads µs, DuckDB ns).
    * Boundary semantics, verified empirically: events exactly gap apart
    * MERGE (Spark merges when next.start <= prev.end), so the oracle
    * breaks strictly at diff > 1800 s.
    *
    * Scale: session state is keyed by user — one shuffle, state size
    * O(open sessions), late data bounded by the watermark in the
    * append-mode deployment; complete mode here is the parity harness,
    * not the production sink. */
  def streamSessionParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_x133").toString
    val ev = Tables.events(spark, dir).filter($"user_id" < SessUsers)
      .select($"user_id", date_trunc("second", $"ts").as("ts"))
    ev.repartition(3).write.mode("overwrite").parquet(s"$base/src")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val sessions = graft.streaming.IncrementalStream.sessionCounts(
      stream, "30 minutes", watermark = None) // late-row filter would drop out-of-order batches
    // complete-mode staging keeps only the final snapshot on disk
    // (executor-written parquet, no driver buffer — r10 verdict #2);
    // the tree is deleted once the snapshot is checkpointed.
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, sessions, base, "complete")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy($"user_id", $"session_start")
  }

  private val streamSessionParityOracle =
    s"""WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts
       |           FROM events WHERE user_id < $SessUsers),
       |f AS (SELECT user_id, ts,
       |        CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |             WHEN CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800 THEN 1
       |             ELSE 0 END AS brk
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |s AS (SELECT user_id, ts,
       |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |      FROM f)
       |SELECT user_id, min(ts) AS session_start,
       |       max(ts) + INTERVAL 30 MINUTE AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** x137: bucketed co-located join — the storage-layout answer to the
    * fact-fact join shuffle (the single most expensive exchange pattern
    * at 100 TB). Both sides are written ONCE as bucketed+sorted tables
    * (8 buckets on the join key, the write's one-time shuffle), after
    * which every future join on that key is exchange-free: the
    * sort-merge join reads matching buckets directly (plan-asserted in
    * OperatorsSpec — no Exchange on either join key; the only exchange
    * left in the query is the final small aggregate's; a LOCAL per-bucket
    * sort remains because Spark only trusts write-time sortedness behind
    * the legacy one-file-per-bucket conf). The
    * `merge` hint pins SMJ so the demo can't degrade to a broadcast at
    * small SF. The oracle verifies the joined result itself.
    *
    * Scale: this is the bucketing contract Spark ships for exactly this
    * case — co-partitioned storage amortizes the shuffle across every
    * downstream join/aggregate on the bucket key; bucket count is chosen
    * per-table at write time (here 8; a 100 TB fact table would use
    * thousands, matched between co-joined tables). */
  def bucketJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_x137_wh").toString
    spark.sql("DROP TABLE IF EXISTS graft_x137_orders")
    spark.sql("DROP TABLE IF EXISTS graft_x137_lineitem")
    Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders").saveAsTable("graft_x137_orders")
    Tables.lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem").saveAsTable("graft_x137_lineitem")
    // eager localCheckpoint so the bucketed tables + warehouse dir can be
    // dropped before returning — repeated runs must not accumulate
    // bucketed copies on disk (the plan-shape assertion lives in
    // OperatorsSpec against bucketJoinOn, not this fn's return)
    val out = bucketJoinOn(spark)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("cents"))
      .localCheckpoint()
    spark.sql("DROP TABLE IF EXISTS graft_x137_orders")
    spark.sql("DROP TABLE IF EXISTS graft_x137_lineitem")
    QueryUtil.deleteRecursively(wh)
    out.orderBy("o_orderpriority")
  }

  /** The exchange-free join core, exposed for the plan-shape spec. */
  private[graft] def bucketJoinOn(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("graft_x137_orders").hint("merge")
      .join(spark.table("graft_x137_lineitem"), $"o_orderkey" === $"l_orderkey")
  }

  private val bucketJoinOracle =
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** x134 knobs — cohort every-5th vector (100 nodes at sf0.01, 1000 at
    * sf0.1), seeds every-25th (1/5 of the cohort), k=5 neighbors, 3
    * synchronous iterations. */
  private val LsK = 5
  private val LsIters = 3

  /** x134: semi-supervised label spreading — pseudo-labeling over the
    * kNN embedding graph, the standard trick for stretching a small
    * labeled set across a large corpus before training a filter model.
    * A 20% seed set keeps its ground-truth label (clamped); every other
    * cohort node iteratively adopts the MAJORITY label among its already-
    * labeled graph neighbors (ties -> smallest label), for 3 synchronous
    * rounds. The graph is the symmetrized cosine top-5 (x105's ranking
    * recipe: rounded cosine, vec_id tie-break). Emitted per true class:
    * cohort size, seeds, how many unlabeled nodes the propagation
    * reached, and how many it labeled CORRECTLY — the accuracy/coverage
    * pair that decides whether the pseudo-labels are usable. The oracle
    * re-derives all three rounds from scratch as unrolled CTEs.
    *
    * Fixture honesty: the synthetic embeddings' labels are independent of
    * cosine geometry (measured 1-NN accuracy ≈ 10% ≈ chance, same as
    * x79's centroid classifier), so the reported accuracy here is ~0.1 —
    * which is exactly what the measurement SHOULD say for this corpus;
    * the query verifies the propagation machinery and the honesty of the
    * metric, and the gate a real pipeline applies ("only trust classes
    * with acc >> chance") would correctly reject these pseudo-labels.
    *
    * Scale: each round is one (edges join labels) hash shuffle plus a
    * per-node majority window — O(E) per round, E = k·|cohort|. The kNN
    * build here is the documented brute-force pair join; at 100 TB the
    * graph would come from the x36 multiprobe-LSH or x34 IVF candidate
    * stage instead (same downstream propagation). */
  def labelSpreading(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Similarity
    val co = Tables.embeddings(spark, dir).filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding", $"label",
        Similarity.norm($"embedding").as("nrm"))
      .localCheckpoint(true) // referenced by both pair sides, seeds, eval
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val top = co.select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
      .join(co.select($"vec_id", $"embedding", $"nrm"), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= LsK)
    val edges = top.select($"q_id".as("src"), $"vec_id".as("dst"))
      .unionByName(top.select($"vec_id".as("src"), $"q_id".as("dst")))
      .distinct()
      .localCheckpoint(true) // re-joined every iteration
    val seeds = co.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("node"), $"label".as("lbl"))
      .localCheckpoint(true)
    var labels = seeds
    for (_ <- 1 to LsIters) {
      val votes = edges.join(labels, $"dst" === $"node")
        .groupBy($"src", $"lbl").agg(count(lit(1)).as("c"))
      val picked = votes
        .withColumn("rn", row_number().over(
          Window.partitionBy($"src").orderBy($"c".desc, $"lbl")))
        .filter($"rn" === 1)
        .select($"src".as("node"), $"lbl")
      labels = seeds
        .unionByName(picked.join(seeds.select($"node"), Seq("node"), "left_anti"))
        .localCheckpoint(true)
    }
    val pred = labels.join(seeds.select($"node"), Seq("node"), "left_anti")
    val truth = co.groupBy($"label").agg(
      count(lit(1)).as("n_nodes"),
      sum(when($"vec_id" % 25 === 0, 1L).otherwise(0L)).as("n_seeds"))
    val scored = pred.join(co.select($"vec_id".as("node"), $"label"), "node")
      .groupBy($"label").agg(
        count(lit(1)).as("n_labeled"),
        sum(when($"lbl" === $"label", 1L).otherwise(0L)).as("n_correct"))
    truth.join(scored, Seq("label"), "left")
      .select($"label", $"n_nodes", $"n_seeds",
        coalesce($"n_labeled", lit(0L)).as("n_labeled"),
        coalesce($"n_correct", lit(0L)).as("n_correct"))
      .withColumn("acc", when($"n_labeled" > 0,
        halfUp4($"n_correct".cast("double") / $"n_labeled")).otherwise(lit(0.0)))
      .orderBy("label")
  }

  private val labelSpreadingOracle = {
    val iterCtes = (1 to LsIters).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS (SELECT e.src, l.lbl, count(*) AS c
         |        FROM ed e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
         |p$i AS (SELECT src AS node, lbl FROM (
         |          SELECT src, lbl, row_number() OVER (PARTITION BY src ORDER BY c DESC, lbl) AS rn
         |          FROM v$i) WHERE rn = 1),
         |l$i AS (SELECT node, lbl FROM seeds
         |        UNION ALL
         |        SELECT node, lbl FROM p$i WHERE node NOT IN (SELECT node FROM seeds))""".stripMargin
    }.mkString(",\n")
    s"""WITH co AS MATERIALIZED (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0),
       |pr AS (SELECT q.vec_id AS q_id, e.vec_id AS vid,
       |         round(${SimilarityQueries.cosineSql("q.embedding", "e.embedding")}, 4) AS cosine
       |       FROM co e JOIN co q ON e.vec_id <> q.vec_id),
       |rnk AS (SELECT q_id, vid, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vid) AS rk
       |        FROM pr),
       |top AS (SELECT q_id, vid FROM rnk WHERE rk <= $LsK),
       |ed AS MATERIALIZED (SELECT q_id AS src, vid AS dst FROM top
       |                    UNION
       |                    SELECT vid AS src, q_id AS dst FROM top),
       |seeds AS MATERIALIZED (SELECT vec_id AS node, label AS lbl FROM co WHERE vec_id % 25 = 0),
       |l0 AS (SELECT node, lbl FROM seeds),
       |$iterCtes,
       |pred AS (SELECT node, lbl FROM l$LsIters WHERE node NOT IN (SELECT node FROM seeds)),
       |truth AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
       |            CAST(sum(CASE WHEN vec_id % 25 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_seeds
       |          FROM co GROUP BY 1),
       |scored AS (SELECT co.label, CAST(count(*) AS BIGINT) AS n_labeled,
       |             CAST(sum(CASE WHEN pred.lbl = co.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |           FROM pred JOIN co ON co.vec_id = pred.node GROUP BY 1)
       |SELECT t.label, t.n_nodes, t.n_seeds,
       |       coalesce(s.n_labeled, 0) AS n_labeled,
       |       coalesce(s.n_correct, 0) AS n_correct,
       |       CASE WHEN coalesce(s.n_labeled, 0) > 0
       |            THEN floor(CAST(s.n_correct AS DOUBLE) / s.n_labeled * 10000 + 0.5) / 10000.0
       |            ELSE 0.0 END AS acc
       |FROM truth t LEFT JOIN scored s ON s.label = t.label
       |ORDER BY t.label""".stripMargin
  }

  /** x138 knobs: attribution window 6 h (wide enough that the uniform
    * synthetic event stream yields matches at every SF), file slices cut
    * at fixed dates (the fixture spans Jan 2024 at all SFs). */
  private val AttrWindowSec = 21600L
  private val SliceCuts = Seq("2024-01-11", "2024-01-21")

  /** Stage a frame as 3 chronological single-file parquet slices with
    * strictly increasing mtimes, so the file stream source (which orders
    * by modification time) replays them in event-time order — the
    * discipline a production file-drop pipeline provides naturally. */
  private def stageSlices(df0: DataFrame, tsCol: String, dir: String): Unit = {
    // r16: snapshot once — slices filter the checkpoint, not a re-scan
    val df = df0.localCheckpoint(true)
    val fs = java.nio.file.FileSystems.getDefault
    SliceCuts.zipWithIndex.foldLeft(Option.empty[String]) { case (lo, (hi, i)) =>
      val slice = lo.fold(df.filter(col(tsCol) < hi))(l =>
        df.filter(col(tsCol) >= l && col(tsCol) < hi))
      slice.coalesce(1).write.parquet(s"$dir/s$i")
      Some(hi)
    } match {
      case Some(last) => df.filter(col(tsCol) >= last).coalesce(1).write.parquet(s"$dir/s${SliceCuts.size}")
      case None => ()
    }
    (0 to SliceCuts.size).foreach { i =>
      val part = new java.io.File(s"$dir/s$i").listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = fs.getPath(s"$dir/f$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
  }

  /** x138: stream-stream join batch parity — the driver-visible oracle
    * pair for `IncrementalStream.clickViewJoin` (watermarked interval
    * join, spec-only until now). Views and clicks are staged as
    * chronological file slices and REALLY streamed (two file sources,
    * maxFilesPerTrigger=1, AvailableNow), so matches form across
    * micro-batch boundaries out of the join's keyed state while the
    * watermark evicts views older than the attribution window. The
    * accumulated append-mode emissions must equal the batch interval
    * join recomputed by the oracle: every click attributed to every view
    * of the same user within the preceding 6 h. Timestamps second-
    * truncated on both sides (q22's convention).
    *
    * Scale: stream-stream join state is keyed by user and bounded by
    * watermark − window; arrival in event-time order (any sane file-drop
    * or Kafka source) keeps evictions exact. The batch equivalent is
    * x61's range join; this closes the STREAMING side of that pair. */
  def streamJoinParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_x138").toString
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts"))
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("view_user"), $"event_id".as("view_id"), $"ts".as("view_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("click_user"), $"event_id".as("click_id"), $"ts".as("click_ts"))
    stageSlices(views, "view_ts", s"$base/v")
    stageSlices(clicks, "click_ts", s"$base/c")
    val vStream = spark.readStream.schema(views.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/v")
    val cStream = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/c")
    val joined = graft.streaming.IncrementalStream
      .clickViewJoin(vStream, cStream, windowSec = AttrWindowSec)
    // The projection runs ON the stream (still executor-side); emissions
    // are parquet-staged, never collected (r10 verdict #2), and the temp
    // tree is deleted once the result is checkpointed.
    val projected = joined.select($"view_user".as("user_id"), $"view_id",
      $"click_id",
      (unix_timestamp($"click_ts".cast("timestamp"))
        - unix_timestamp($"view_ts".cast("timestamp"))).as("delta_s"))
    val emitted = QueryUtil.withStreamShuffle(spark) {
      QueryUtil.stageStream(spark, projected, base, "append")
    }
    QueryUtil.deleteRecursively(base)
    emitted.orderBy("view_id", "click_id")
  }

  private val streamJoinParityOracle =
    s"""WITH v AS (SELECT user_id, event_id AS view_id, date_trunc('second', ts) AS vts
       |           FROM events WHERE event_type = 'view'),
       |c AS (SELECT user_id, event_id AS click_id, date_trunc('second', ts) AS cts
       |      FROM events WHERE event_type = 'click')
       |SELECT v.user_id, v.view_id, c.click_id,
       |       CAST(epoch(c.cts) AS BIGINT) - CAST(epoch(v.vts) AS BIGINT) AS delta_s
       |FROM v JOIN c ON c.user_id = v.user_id
       |              AND c.cts >= v.vts
       |              AND c.cts <= v.vts + INTERVAL $AttrWindowSec SECONDS
       |ORDER BY view_id, click_id""".stripMargin

  /** x139: partition-pruned scan — the layout twin of x137. Orders are
    * written ONCE partitioned by order year (the standard date-partition
    * layout of every 100 TB fact table); a year-filtered aggregate then
    * reads exactly one directory: the filter binds to the partition
    * column at PLANNING time, so pruning happens in the file index — no
    * data file of any other year is even opened (plan-asserted in
    * OperatorsSpec: `PartitionFilters` carries the year predicate and
    * the scan selects 1 of 7 partitions). q92 ESTIMATES what layouts
    * save; this demonstrates the physical mechanism on disk.
    *
    * Scale: partition pruning is O(|partitions|) metadata work
    * regardless of data size — the difference between scanning 1/84th
    * of 100 TB and all of it for a month-bounded query. */
  def partitionPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x139").toString
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
        year($"o_orderdate".cast("date")).as("o_year"))
      .write.partitionBy("o_year").parquet(s"$base/orders")
    // eager localCheckpoint so the partitioned copy can be deleted before
    // returning (plan assertion lives in OperatorsSpec via partitionPruneOn)
    val out = partitionPruneOn(spark, base)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("cents"))
      .localCheckpoint()
    QueryUtil.deleteRecursively(base)
    out.orderBy("o_orderpriority")
  }

  /** The pruned-scan core, exposed for the plan-shape spec (returns the
    * filtered read; the spec asserts PartitionFilters + partition count). */
  private[graft] def partitionPruneOn(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/orders").filter(col("o_year") === 1995)

  private val partitionPruneOracle =
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |WHERE year(CAST(o_orderdate AS DATE)) = 1995
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q97_histogram_merge",
      "mergeable equi-width histograms: two partitionings merge bitwise-identically; histogram p50 within one bin of exact",
      histogramMerge, Some(histogramMergeOracle)),
    QueryDef("q98_mcv_join_card",
      "MCV-aware join cardinality estimate vs naive NDV formula vs true cardinality on the skewed lang self-join",
      mcvJoinCard, Some(mcvJoinCardOracle)),
    QueryDef("q99_incremental_stats",
      "incremental ANALYZE: merge(stats(T), stats(delta)) == stats(T u delta) exactly for count/sum/min/max, HLL NDV within 5%",
      incrementalStats, Some(incrementalStatsOracle)),
    QueryDef("x135_dup_ngram_mass",
      "duplicated 8-gram mass per document (Lee et al. span-dedup measurement) with the raw-fraction keep gate",
      dupNgramMass, Some(dupNgramMassOracle)),
    QueryDef("x136_survivor_quality",
      "quality-aware survivor selection per near-dup cluster: argmax-quality member vs the naive min-id canonical, with measured gain",
      survivorQuality, Some(survivorQualityOracle)),
    QueryDef("x133_stream_session_parity",
      "streaming session_window batch parity: real multi-batch file-stream run with cross-batch session merge == lag-gap recompute oracle",
      streamSessionParity, Some(streamSessionParityOracle),
      // r15 verdict #5 (streaming-parity bill): constant-gap
      // session_window append drains are the special case of the
      // still-timed x323_stream_dyngap_append (same session-window
      // state-store operator, gap expression generalized) — Verify-gated
      // every round, not re-timed.
      benchSkip = true),
    QueryDef("x137_bucket_join",
      "bucketed co-located fact-fact join: one-time bucketed write, then exchange-free sort-merge join (plan-asserted)",
      bucketJoin, Some(bucketJoinOracle)),
    QueryDef("x134_label_spreading",
      "semi-supervised pseudo-labeling: 3-round clamped majority propagation over the symmetrized cosine top-5 graph, scored per class",
      labelSpreading, Some(labelSpreadingOracle)),
    QueryDef("x138_stream_join_parity",
      "stream-stream interval join batch parity: chronological file replay through the watermarked click-attribution join == batch interval join",
      streamJoinParity, Some(streamJoinParityOracle),
      // r15 verdict #5: the INNER interval-join drains are a strict
      // subset of the still-timed x242_stream_outer_join_parity's
      // left-outer matrix (same watermarked stream-stream join state,
      // plus the unmatched-flush arm) — Verify-gated, not re-timed.
      benchSkip = true),
    QueryDef("x139_partition_prune",
      "date-partitioned write + partition-pruned scan: year filter binds at planning time, 1 of 7 directories read (plan-asserted)",
      partitionPrune, Some(partitionPruneOracle)))
}
