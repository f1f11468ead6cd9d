package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third coverage batch: sketch aggregates (rows-only check — HLL/KLL
  * sketches are engine-specific so no DuckDB hash parity is possible),
  * SQL-text entry with GROUPING SETS, and text normalization (X4). */
object RelationalQueries3 {

  /** Approximate aggregates: HyperLogLog++ distinct counts and quantile
    * sketches. Sketch internals can't hash-match across engines, so the
    * query emits ERROR-BOUND booleans instead: approx-vs-exact relative
    * error within the sketch's guarantee (5% for default-rsd HLL, 5% for
    * rsd=0.01 HLL, 2% value error for the 1/10000-rank-accuracy quantile
    * sketch). The oracle asserts the bounds hold (all 1), which makes the
    * row hash-matchable AND makes the driver loop an accuracy assertion —
    * a wrong sketch now fails CORRECTNESS instead of passing rows>0. */
  def q31(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    // The sketch/percentile aggregates and the exact distinct counts run as
    // SEPARATE aggregations joined on the 3-row group key: mixing them in
    // one agg triggers the Expand-based multi-distinct rewrite, whose first
    // aggregate groups by (returnflag, partkey, suppkey) — carrying an HLL +
    // quantile buffer for every one of ~200k distinct keys (22 s at sf0.1
    // vs ~2 s split). The split keeps sketch state at one buffer per group
    // per partition and the distinct-count expand carries no sketch state.
    val sketches = li.groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("ap"),
        approx_count_distinct($"l_suppkey", 0.01).as("asup"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("amed"),
        count(lit(1)).as("n"))
    val exact = li.groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("ep"),
        countDistinct($"l_suppkey").as("esup"))
    // Exact median via the q25 rank-join plan (sort window + two-row pick),
    // NOT the percentile() aggregate: percentile() buffers every group
    // value in one in-memory aggregation buffer, while the window sort
    // spills — the only formulation that survives a 100 TB group.
    val vals = li.select($"l_returnflag", $"l_extendedprice")
    val cnt = vals.groupBy($"l_returnflag").agg(count(lit(1)).as("cn"))
    val pos = ($"cn" - 1).cast("double") * 0.5
    val med = vals
      .withColumn("rn", row_number().over(
        Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")))
      .join(broadcast(cnt), "l_returnflag")
      .groupBy($"l_returnflag")
      .agg(
        max(when($"rn" === floor(pos) + 1, $"l_extendedprice")).as("__lo"),
        max(when($"rn" === ceil(pos) + 1, $"l_extendedprice")).as("__hi"),
        max(pos).as("__pos"))
      .select($"l_returnflag",
        when(floor($"__pos") === ceil($"__pos"), $"__lo")
          .otherwise($"__lo" * (ceil($"__pos") - $"__pos")
            + $"__hi" * ($"__pos" - floor($"__pos"))).as("emed"))
    sketches.join(exact, "l_returnflag").join(med, "l_returnflag")
      .select(
        $"l_returnflag",
        (abs($"ap" - $"ep") <= $"ep" * 0.05).cast("int").as("parts_ok"),
        (abs($"asup" - $"esup") <= $"esup" * 0.05).cast("int").as("supps_ok"),
        (abs($"amed" - $"emed") <= $"emed" * 0.02).cast("int").as("median_ok"),
        $"n")
      .orderBy($"l_returnflag")
  }

  private val q31Oracle =
    """SELECT l_returnflag,
      |       1 AS parts_ok, 1 AS supps_ok, 1 AS median_ok,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** SQL-text entry point: the library's plans are reachable through
    * `spark.sql` over registered views — exercised with GROUPING SETS
    * (SQL-only surface, no DataFrame API equivalent). */
  def q32(spark: SparkSession, dir: String) = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  private val q32Oracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  /** X4 text normalization: lowercase, strip non-alphanumerics, drop
    * stopwords, re-join — the canonical cleaning stage before dedup.
    * Native one-pass `stop_strip` (the declarative form paid two
    * interpreted HOF lambdas each re-splitting the text); the fence keeps
    * CollapseProject from inlining the struct into both field extracts. */
  def x45(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val stop = graft.operators.TextAnalysis.StopwordsEn
    Tables.documents(spark, dir)
      .select($"doc_id", QueryUtil.fence(
        call_function("stop_strip", $"text", array(stop.map(lit): _*))).as("s"))
      .select($"doc_id",
        $"s.clean_text".as("clean_text"),
        $"s.n_stop".as("n_stop_removed"))
      .orderBy("doc_id")
  }

  private val x45Oracle = {
    val stopList = graft.operators.TextAnalysis.StopwordsEn.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id,
       |             string_split(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' ') AS toks
       |           FROM documents)
       |SELECT doc_id,
       |       array_to_string(list_filter(toks, t -> t NOT IN ($stopList) AND t <> ''), ' ') AS clean_text,
       |       CAST(len(list_filter(toks, t -> t IN ($stopList))) AS INTEGER) AS n_stop_removed
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q31_approx_sketches", "HLL++ distinct counts + quantile sketch, error-bound asserted vs exact", q31, Some(q31Oracle)),
    QueryDef("q32_sql_grouping_sets", "spark.sql text entry with GROUPING SETS", q32, Some(q32Oracle)),
    QueryDef("x45_text_normalize", "lowercase/strip/stopword-removal cleaning stage (X4)", x45, Some(x45Oracle)))
}
