package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 eleventh tier: TextRank keyword extraction (PageRank over the
  * word co-occurrence graph), sliding-window distinct counting with
  * mergeable HLL day-sketches, and range-predicate selectivity estimation
  * from the q97 histogram — closing the stats loop stats → estimate →
  * audit for scans the way q94/q98 closed it for joins. */
object Round10Queries11 {

  /** x161 PageRank iterations (matches x63's unroll depth). */
  private val TrIters = 3

  /** x161: TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    * keywords are the highest-PageRank nodes of the word co-occurrence
    * graph (±2 token window, symmetrized, weight = co-occurrence count).
    * Reuses x20's ARRAY-LOCAL pair generation (shifted slice + zip_with,
    * zero shuffle until the vocab-bounded edge aggregate) and x63's
    * exact-integer 1e-9 fixed-point PageRank trajectory, so the oracle
    * can re-derive the full 3-iteration ranking with integer `//` CTEs.
    * Symmetrization guarantees no dangling nodes, hence zero dangling
    * share in both engines.
    *
    * Scale: pair generation is per-row; the edge aggregate and every
    * rank iteration are vocab-bounded (graph size = vocabulary², sparse)
    * — independent of corpus size beyond the first aggregate. */
  def textrank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = split(col("text"), " ")
    val n = size(t)
    def pairsAt(d: Int) = zip_with(
      slice(t, lit(1), greatest(n - d, lit(0))),
      slice(t, lit(1 + d), greatest(n - d, lit(0))),
      (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b")))
    val cab = Tables.documents(spark, dir)
      .select(explode(concat(pairsAt(1), pairsAt(2))).as("pr"))
      .select($"pr.a".as("a"), $"pr.b".as("b"))
      .filter($"a" =!= $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("w"))
    val edges = cab.select($"a".as("src"), $"b".as("dst"), $"w")
      .unionByName(cab.select($"b".as("src"), $"a".as("dst"), $"w"))
    Graph.pageRank(edges, TrIters)
      .orderBy($"rank_fp".desc, $"node")
      .limit(15)
      .select($"node".as("token"), $"rank_fp",
        ($"rank_fp" / lit(1e9)).as("rank"))
  }

  private val textrankOracle: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (SELECT n.node,
         |  (SELECT base FROM params) + COALESCE(s.inc, 0) AS rank_fp
         |  FROM n LEFT JOIN (
         |    SELECT e.dst, CAST(sum((85 * r.rank_fp * e.w) // (100 * e.outw)) AS BIGINT) AS inc
         |    FROM e JOIN $prev r ON e.src = r.node
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tokpos AS MATERIALIZED (
       |  SELECT doc_id, pos, toks[pos] AS tok FROM (
       |    SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM base)),
       |pr AS MATERIALIZED (
       |  SELECT least(l.tok, r.tok) AS a, greatest(l.tok, r.tok) AS b
       |  FROM tokpos l JOIN tokpos r
       |    ON l.doc_id = r.doc_id AND r.pos > l.pos AND r.pos <= l.pos + 2
       |  WHERE l.tok <> r.tok),
       |cab AS MATERIALIZED (SELECT a, b, count(*) AS w FROM pr GROUP BY 1, 2),
       |e0 AS MATERIALIZED (
       |  SELECT a AS src, b AS dst, w FROM cab
       |  UNION ALL SELECT b, a, w FROM cab),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e0 GROUP BY 1),
       |e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.w, ow.outw FROM e0 JOIN ow ON e0.src = ow.src),
       |n AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0),
       |params AS MATERIALIZED (SELECT count(*) AS nn, 1000000000 // count(*) AS init,
       |                  150000000 // count(*) AS base FROM n),
       |r0 AS (SELECT node, (SELECT init FROM params) AS rank_fp FROM n),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node AS token, rank_fp, rank_fp / 1000000000.0 AS rank
       |FROM r3
       |ORDER BY rank_fp DESC, token
       |LIMIT 15""".stripMargin
  }

  /** x162 HLL precision (same lgK as q96). */
  private val WinLgK = 12

  /** x162: sliding-window distinct actives from mergeable day-sketches —
    * the sketch answer to q46's exact 7-day WAU: one HLL sketch per day
    * (built once, O(2^lgK) bytes of state each), every window answered by
    * UNIONING the 7 day-sketches instead of rescanning raw events. The
    * exact WAU is computed alongside (trailing join over distinct
    * (user, day) pairs) and the estimate must land within 5% — the lgK=12
    * envelope q96 established. This is the pattern that makes "distinct
    * users over ANY trailing window" an O(days × sketch) query at 100 TB
    * instead of an O(events) rescan per window.
    *
    * Scale: raw events are touched exactly twice (day-sketch build, exact
    * audit — the audit drops in production); window assembly is a banded
    * join on the tiny day panel. */
  def windowHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), lit("2024-01-01")).as("dayn"), $"user_id")
    val daySk = ev.groupBy($"dayn")
      .agg(hll_sketch_agg($"user_id", lit(WinLgK)).as("sk"))
      .localCheckpoint(true) // both sides of the trailing-window join
    val est = daySk.select($"dayn").join(
        daySk.select($"dayn".as("p_dayn"), $"sk"),
        $"p_dayn" >= $"dayn" - 6 && $"p_dayn" <= $"dayn")
      .groupBy($"dayn")
      .agg(count(lit(1)).as("window_days"),
        hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est"))
    val ud = ev.distinct().localCheckpoint(true)
    val exact = ud.select($"dayn").distinct().join(
        ud.select($"dayn".as("p_dayn"), $"user_id"),
        $"p_dayn" >= $"dayn" - 6 && $"p_dayn" <= $"dayn")
      .groupBy($"dayn")
      .agg(countDistinct($"user_id").as("wau_exact"))
    est.join(exact, "dayn")
      .select($"dayn", $"window_days", $"wau_exact",
        (abs($"est" - $"wau_exact") <= $"wau_exact" * 0.05)
          .cast("int").as("sketch_within_5pct"))
      .orderBy("dayn")
  }

  private val windowHllOracle =
    """WITH ud AS MATERIALIZED (
      |  SELECT DISTINCT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
      |         user_id
      |  FROM events),
      |days AS (SELECT DISTINCT dayn FROM ud)
      |SELECT d.dayn,
      |       CAST(count(DISTINCT p.dayn) AS BIGINT) AS window_days,
      |       CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau_exact,
      |       1 AS sketch_within_5pct
      |FROM days d JOIN ud p
      |  ON p.dayn >= d.dayn - 6 AND p.dayn <= d.dayn
      |GROUP BY d.dayn
      |ORDER BY d.dayn""".stripMargin

  /** x163 histogram bin width (shared with q97) and the audited range
    * predicates — deliberately NOT aligned to bin edges so the estimate
    * must interpolate inside bins. */
  private val HistW = 25000L
  private val SelRanges: Seq[(Int, Long, Long)] =
    (0 until 8).map(r => (r, 20000L + r * 40000L, 50000L + r * 40000L))

  /** x163: range-predicate selectivity estimation from the equi-width
    * histogram — the scan-side completion of the stats loop (q93 builds
    * stats, q94/q98 audit JOIN cardinality, this audits RANGE selectivity):
    * estimated rows = Σ_bins cnt · overlap(bin, range)/W under the
    * uniform-within-bin assumption. The overlap widths are exact integers
    * (all edges are integer), so est_fp = Σ cnt·overlap_w is an
    * order-free integer sum and the single division by W happens once at
    * the end — no float accumulation. True counts come from ONE
    * conditional-aggregate pass over the table (no per-range rescan);
    * the per-range error column is what a CBO regression suite tracks.
    *
    * Scale: the histogram is O(bins) state; estimation is O(bins·ranges)
    * arithmetic on stats, touching no data; the truth pass is one scan
    * with 8 conditional sums (audit-only — production trusts the stats). */
  def histogramSelectivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_totalprice", floor($"o_totalprice" / HistW).cast("long").as("bin"))
    val hist = o.groupBy($"bin").agg(count(lit(1)).as("cnt"))
    val ranges = SelRanges.toDF("range_id", "lo", "hi")
    val est = hist.crossJoin(broadcast(ranges))
      .select($"range_id", $"lo", $"hi", ($"cnt" *
        greatest(lit(0L),
          least($"hi", ($"bin" + 1) * HistW) - greatest($"lo", $"bin" * HistW)))
        .as("contrib"))
      .groupBy($"range_id", $"lo", $"hi")
      .agg(sum($"contrib").as("est_fp"))
    val truthRow = o.agg(
      SelRanges.map { case (r, lo, hi) =>
        sum(when($"o_totalprice" >= lo && $"o_totalprice" < hi, 1L).otherwise(0L)).as(s"t$r")
      }.head,
      SelRanges.map { case (r, lo, hi) =>
        sum(when($"o_totalprice" >= lo && $"o_totalprice" < hi, 1L).otherwise(0L)).as(s"t$r")
      }.tail: _*)
    val truth = truthRow.selectExpr(
      s"stack(${SelRanges.size}, " +
        SelRanges.map { case (r, _, _) => s"$r, t$r" }.mkString(", ") +
        ") as (range_id, true_rows)")
    est.join(truth, "range_id")
      .select($"range_id", $"lo", $"hi", $"est_fp",
        QueryUtil.halfUp4($"est_fp" / lit(HistW.toDouble)).as("est_rows"),
        $"true_rows",
        QueryUtil.halfUp4($"est_fp" / lit(HistW.toDouble) - $"true_rows").as("err"))
      .orderBy("range_id")
  }

  private val histogramSelectivityOracle = {
    val rangeValues = SelRanges
      .map { case (r, lo, hi) => s"($r, $lo, $hi)" }.mkString(", ")
    s"""WITH h AS (SELECT CAST(floor(o_totalprice / $HistW) AS BIGINT) AS bin,
       |                  CAST(count(*) AS BIGINT) AS cnt
       |           FROM orders GROUP BY 1),
       |r(range_id, lo, hi) AS (VALUES $rangeValues),
       |est AS (
       |  SELECT r.range_id, r.lo, r.hi,
       |         CAST(sum(h.cnt * greatest(0, least(r.hi, (h.bin + 1) * $HistW)
       |                                      - greatest(r.lo, h.bin * $HistW))) AS BIGINT) AS est_fp
       |  FROM h CROSS JOIN r
       |  GROUP BY r.range_id, r.lo, r.hi)
       |SELECT range_id, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, est_fp,
       |       floor(est_fp / $HistW.0 * 10000 + 0.5) / 10000.0 AS est_rows,
       |       (SELECT CAST(count(*) AS BIGINT) FROM orders
       |        WHERE o_totalprice >= lo AND o_totalprice < hi) AS true_rows,
       |       floor((est_fp / $HistW.0
       |              - (SELECT count(*) FROM orders
       |                 WHERE o_totalprice >= lo AND o_totalprice < hi)) * 10000 + 0.5)
       |         / 10000.0 AS err
       |FROM est
       |ORDER BY range_id""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x161_textrank",
      "TextRank keywords: exact fixed-point PageRank over the +-2-window word co-occurrence graph, 3 unrolled iterations",
      textrank, Some(textrankOracle)),
    QueryDef("x162_window_hll",
      "sliding 7-day distinct actives from merged per-day HLL sketches, 5pct-audited vs exact WAU",
      windowHll, Some(windowHllOracle)),
    QueryDef("x163_histogram_selectivity",
      "range-predicate selectivity estimates from the equi-width histogram, integer overlap arithmetic, error vs true counts",
      histogramSelectivity, Some(histogramSelectivityOracle)))
}
