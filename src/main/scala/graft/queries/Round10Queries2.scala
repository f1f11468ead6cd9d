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

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q97_histogram_merge",
      "mergeable equi-width histograms: two partitionings merge bitwise-identically; histogram p50 within one bin of exact",
      histogramMerge, Some(histogramMergeOracle)),
    QueryDef("q98_mcv_join_card",
      "MCV-aware join cardinality estimate vs naive NDV formula vs true cardinality on the skewed lang self-join",
      mcvJoinCard, Some(mcvJoinCardOracle)),
    QueryDef("q99_incremental_stats",
      "incremental ANALYZE: merge(stats(T), stats(delta)) == stats(T u delta) exactly for count/sum/min/max, HLL NDV within 5%",
      incrementalStats, Some(incrementalStatsOracle)))
}
