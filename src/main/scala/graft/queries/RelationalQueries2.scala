package graft.queries

import graft.{QueryDef, Tables}
import graft.queries.QueryUtil.halfUp4
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational coverage batch: full window-function family,
  * statistical aggregates, exact percentiles, argmin/argmax, BPE-ish regex
  * tokenization, date arithmetic, null-handling scalar functions. */
object RelationalQueries2 {

  /** Window family: rank/dense_rank/ntile/percent_rank/cume_dist and
    * first/last over an explicit full frame — one shuffle on o_custkey
    * shared by every window (same partition+order spec). */
  def q23(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        $"o_custkey", $"o_orderkey",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        halfUp4(percent_rank().over(w)).as("prank"),
        halfUp4(cume_dist().over(w)).as("cdist"),
        first($"o_orderkey").over(full).as("best_order"),
        last($"o_orderkey").over(full).as("worst_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q23Oracle =
    """SELECT o_custkey, o_orderkey,
      |       rank() OVER w AS rnk,
      |       dense_rank() OVER w AS drnk,
      |       ntile(4) OVER w AS quartile,
      |       floor(percent_rank() OVER w * 10000 + 0.5) / 10000.0 AS prank,
      |       floor(cume_dist() OVER w * 10000 + 0.5) / 10000.0 AS cdist,
      |       first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_order,
      |       last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Statistical aggregates (sample stddev/variance, correlation,
    * covariance) — computed from explicit raw moments (sum x, sum x²,
    * sum xy, n) with the SAME derived formula in both engines, so the only
    * cross-engine difference is ulp-level summation order, far below the
    * half-up rounding grid. Native `stddev/corr/covar` accumulate via
    * different single-pass algorithms per engine and diverge exactly at
    * rounding boundaries (round-1 q24 hash FAIL). */
  def q24(spark: SparkSession, dir: String) = {
    import spark.implicits._
    import QueryUtil.halfUp
    val p = $"l_extendedprice"
    val q = $"l_quantity".cast("double")
    val d = $"l_discount"
    val t = $"l_tax"
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("nn"),
        sum(p).as("sp"), sum(p * p).as("spp"),
        sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(p * q).as("spq"),
        sum(d).as("sd"), sum(t).as("st"), sum(d * t).as("sdt"))
      .select(
        $"l_returnflag",
        halfUp(sqrt(($"spp" - $"sp" * $"sp" / $"nn") / ($"nn" - 1)), 2).as("sd_price"),
        halfUp(($"sqq" - $"sq" * $"sq" / $"nn") / ($"nn" - 1), 4).as("var_qty"),
        halfUp(($"spq" - $"sp" * $"sq" / $"nn") /
          sqrt(($"spp" - $"sp" * $"sp" / $"nn") * ($"sqq" - $"sq" * $"sq" / $"nn")), 4).as("corr_pq"),
        halfUp(($"sdt" - $"sd" * $"st" / $"nn") / ($"nn" - 1), 6).as("cov_dt"),
        $"nn".cast("long").as("n"))
      .orderBy($"l_returnflag")
  }

  private val q24Oracle =
    """WITH sums AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS nn,
      |         sum(l_extendedprice) AS sp,
      |         sum(l_extendedprice * l_extendedprice) AS spp,
      |         sum(CAST(l_quantity AS DOUBLE)) AS sq,
      |         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sqq,
      |         sum(l_extendedprice * CAST(l_quantity AS DOUBLE)) AS spq,
      |         sum(l_discount) AS sd, sum(l_tax) AS st,
      |         sum(l_discount * l_tax) AS sdt
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       floor(sqrt((spp - sp * sp / nn) / (nn - 1)) * 100 + 0.5) / 100.0 AS sd_price,
      |       floor(((sqq - sq * sq / nn) / (nn - 1)) * 10000 + 0.5) / 10000.0 AS var_qty,
      |       floor(((spq - sp * sq / nn) /
      |              sqrt((spp - sp * sp / nn) * (sqq - sq * sq / nn))) * 10000 + 0.5) / 10000.0 AS corr_pq,
      |       floor(((sdt - sd * st / nn) / (nn - 1)) * 1000000 + 0.5) / 1000000.0 AS cov_dt,
      |       CAST(nn AS BIGINT) AS n
      |FROM sums
      |ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles (≡ DuckDB `quantile_cont`), computed
    * scale-safely: Spark's `percentile()` aggregate buffers EVERY value of a
    * group in one in-memory aggregation buffer — a hot group at 100× scale
    * is an executor OOM. Instead: rank within group (`row_number` after a
    * shuffle-sort; WindowExec spills its per-group buffer to disk), join the
    * tiny per-group counts (broadcast), and keep only the two interpolation
    * neighbors per quantile. Same interpolation formula as Spark's
    * `Percentile.getPercentile` (`lo*(hi-pos) + hi*(pos-lo)` at 0-based
    * `pos = (n-1)*q`), so results are bit-compatible with the old plan. */
  def q25(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderpriority", $"o_totalprice")
    val counts = o.groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val ranked = o
      .withColumn("rn", row_number().over(
        Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")))
      .join(broadcast(counts), "o_orderpriority")
    val quantiles = Seq(0.5 -> "median_price", 0.25 -> "p25", 0.95 -> "p95")
    val aggs = quantiles.flatMap { case (q, nm) =>
      val pos = ($"n" - 1).cast("double") * q
      Seq(
        max(when($"rn" === floor(pos) + 1, $"o_totalprice")).as(s"__lo_$nm"),
        max(when($"rn" === ceil(pos) + 1, $"o_totalprice")).as(s"__hi_$nm"),
        max(pos).as(s"__pos_$nm"))
    } :+ max($"n").as("n")
    val outCols = quantiles.map { case (_, nm) =>
      val pos = col(s"__pos_$nm")
      val lo = floor(pos)
      val hi = ceil(pos)
      round(when(lo === hi, col(s"__lo_$nm"))
        .otherwise(col(s"__lo_$nm") * (hi - pos) + col(s"__hi_$nm") * (pos - lo)), 2)
        .as(nm)
    }
    ranked.groupBy($"o_orderpriority")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("o_orderpriority") +: outCols :+ col("n"): _*)
      .orderBy($"o_orderpriority")
  }

  private val q25Oracle =
    """SELECT o_orderpriority,
      |       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
      |       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      |       round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
      |       count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** argmin/argmax aggregates: per customer, the orderkey of the priciest
    * and cheapest order (totalprice is a random double — ties have measure
    * ~zero; row_number q07 is the tie-safe variant). */
  def q26(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        max_by($"o_orderkey", $"o_totalprice").as("best_order"),
        min_by($"o_orderkey", $"o_totalprice").as("worst_order"),
        round(max($"o_totalprice"), 2).as("best_price"))
      .orderBy($"o_custkey")
  }

  private val q26Oracle =
    """SELECT o_custkey,
      |       arg_max(o_orderkey, o_totalprice) AS best_order,
      |       arg_min(o_orderkey, o_totalprice) AS worst_order,
      |       round(max(o_totalprice), 2) AS best_price
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** X4 token counting, BPE-ish: regex alternation of letter runs, digit
    * runs, and single punctuation — branches are disjoint by first
    * character, so Java-regex (leftmost-first) and RE2 (leftmost-longest)
    * agree. */
  def q27(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_bpe"),
        size(split($"text", " ")).as("n_ws"))
      .groupBy($"source")
      .agg(
        sum($"n_bpe".cast("long")).as("bpe_tokens"),
        sum($"n_ws".cast("long")).as("ws_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy($"source")
  }

  private val q27Oracle =
    """SELECT source,
      |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |       count(*) AS n_docs
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Date arithmetic: day offsets, month adds (with month-end clamping),
    * day diffs — rendered as strings so both engines emit identical types. */
  def q28(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 200)
      .select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("d0"),
        date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd").as("plus30d"),
        date_format(add_months($"o_orderdate", 1), "yyyy-MM-dd").as("plus1m"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_2002"),
        quarter($"o_orderdate").as("qtr"),
        weekofyear($"o_orderdate").as("wk"))
      .orderBy($"o_orderkey")
  }

  private val q28Oracle =
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS d0,
      |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
      |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus1m,
      |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |       CAST(weekofyear(o_orderdate) AS INTEGER) AS wk
      |FROM orders
      |WHERE o_orderkey <= 200
      |ORDER BY o_orderkey""".stripMargin

  /** Null-handling scalars: nullif/coalesce/ifnull-style defaulting and
    * null-aware comparisons over a column with injected nulls. */
  def q29(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 300)
      .select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("status_nulled"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_defaulted"),
        ($"o_orderstatus" <=> lit("O")).cast("int").as("is_open_nullsafe"),
        when($"o_totalprice" > 100000, $"o_totalprice").otherwise(lit(null)).as("big_price_or_null"),
        isnull(when($"o_totalprice" > 100000, $"o_totalprice")).cast("int").as("is_small"))
      .orderBy($"o_orderkey")
  }

  private val q29Oracle =
    """SELECT o_orderkey,
      |       nullif(o_orderstatus, 'O') AS status_nulled,
      |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_defaulted,
      |       CAST(o_orderstatus IS NOT DISTINCT FROM 'O' AS INTEGER) AS is_open_nullsafe,
      |       CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big_price_or_null,
      |       CAST(CASE WHEN o_totalprice > 100000 THEN o_totalprice END IS NULL AS INTEGER) AS is_small
      |FROM orders
      |WHERE o_orderkey <= 300
      |ORDER BY o_orderkey""".stripMargin

  /** Map + struct construction and field access (complex-type surface):
    * build per-row structs/maps, extract back out. */
  def q30(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.nation(spark, dir)
      .select(
        $"n_nationkey",
        struct($"n_name".as("name"), $"n_regionkey".as("rk")).as("s"),
        map(lit("name"), $"n_name", lit("key"), $"n_nationkey".cast("string")).as("m"))
      .select(
        $"n_nationkey",
        $"s.name".as("s_name"),
        $"s.rk".as("s_rk"),
        element_at($"m", "name").as("m_name"),
        element_at($"m", "key").as("m_key"))
      .orderBy($"n_nationkey")
  }

  private val q30Oracle =
    """SELECT n_nationkey,
      |       s['name'] AS s_name, CAST(s['rk'] AS INTEGER) AS s_rk,
      |       m['name'][1] AS m_name, m['key'][1] AS m_key
      |FROM (SELECT n_nationkey,
      |             {'name': n_name, 'rk': n_regionkey} AS s,
      |             map(['name', 'key'], [n_name, CAST(n_nationkey AS VARCHAR)]) AS m
      |      FROM nation)
      |ORDER BY n_nationkey""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q23_window_family", "rank/dense_rank/ntile/percent_rank/cume_dist/first/last", q23, Some(q23Oracle)),
    QueryDef("q24_stats_aggs", "stddev/variance/corr/covar aggregates", q24, Some(q24Oracle)),
    QueryDef("q25_percentiles", "exact interpolated percentiles per group", q25, Some(q25Oracle)),
    QueryDef("q26_argminmax", "min_by/max_by aggregates", q26, Some(q26Oracle)),
    QueryDef("q27_bpe_tokens", "BPE-ish regex + whitespace token counts (X4)", q27, Some(q27Oracle)),
    QueryDef("q28_date_arith", "date offsets, month adds, day diffs", q28, Some(q28Oracle)),
    QueryDef("q29_null_funcs", "nullif/coalesce/null-safe comparison family", q29, Some(q29Oracle)),
    QueryDef("q30_struct_map", "struct/map construction + field access", q30, Some(q30Oracle)))
}
