package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third coverage batch: sketch aggregates (rows-only check — HLL/KLL
  * sketches are engine-specific so no DuckDB hash parity is possible),
  * SQL-text entry with GROUPING SETS, and text normalization (X4). */
object RelationalQueries3 {

  /** Approximate aggregates: HyperLogLog++ distinct counts and quantile
    * sketches. No oracle (sketch internals differ across engines by
    * design); accuracy vs exact values is spec-asserted in
    * ApproxAggSpec, and the driver records a rows>0 check. */
  def q31(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        approx_count_distinct($"l_suppkey", 0.01).as("approx_supps"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx_median"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

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
    * stopwords, re-join — the canonical cleaning stage before dedup. */
  def x45(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val stop = graft.operators.TextAnalysis.StopwordsEn
    val toks = split(trim(regexp_replace(lower($"text"), lit("[^a-z0-9 ]"), lit(""))), " ")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        array_join(filter(toks, t => !t.isInCollection(stop) && t =!= ""), " ").as("clean_text"),
        size(filter(toks, t => t.isInCollection(stop))).as("n_stop_removed"))
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q31_approx_sketches", "HLL++ distinct counts + quantile sketch (rows-only check)", q31, None),
    QueryDef("q32_sql_grouping_sets", "spark.sql text entry with GROUPING SETS", q32, Some(q32Oracle)),
    QueryDef("x45_text_normalize", "lowercase/strip/stopword-removal cleaning stage (X4)", x45, Some(x45Oracle)))
}
