package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 twelfth tier: the column-encoding advisor — the engine-ops
  * decision every columnar writer (parquet/ORC) makes per column chunk:
  * PLAIN vs DICTIONARY vs RLE, from exact census statistics (row count,
  * NDV, value-run count, byte widths). Companion to x328 (posting-list
  * compression sizing) and q92/x163 (zone maps / selectivity): together
  * they cover the storage-layout advisor surface.
  */
object Round13Queries12 {

  /** Rows per "page" (by orderkey bucket): runs are counted WITHIN pages
    * only, because real columnar encodings reset per page — and it makes
    * the run-count window partitionable instead of a global sort. */
  private val PageOrders = 1000L

  /** x338: encoding advisor over five lineitem columns, melted to
    * (column, value-as-string) under the deterministic (orderkey,
    * linenumber) file order. Census per column: n, Σlen, max len, NDV,
    * Σ distinct len, and page-local runs (lag within (column, page)).
    * Sizing model (bytes, all integer): PLAIN = Σlen + 4n (length
    * prefixes); DICT = Σdlen + 4·NDV + ⌈n·bw/8⌉ with the bit width from
    * a log-free threshold CASE (x328 convention); RLE = runs·(maxlen+4)
    * (worst-case run literals). best = argmin with the fixed tie order
    * dict ≺ rle ≺ plain. Doubles appear nowhere.
    *
    * Scale: one melt pass (5× scan width), run counting parallelizes by
    * (column, page) partitions — no global sort; the NDV census is a
    * distinct + count per column. At 100 TB pages map to row groups and
    * the advisor output stays |columns| rows. */
  def encodingAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        expr(s"l_orderkey DIV $PageOrders").as("page"),
        $"l_returnflag".as("v_flag"), $"l_linestatus".as("v_status"),
        $"l_quantity".cast("long").cast("string").as("v_qty"),
        floor($"l_discount" * 100 + 0.5).cast("long").cast("string").as("v_disc"),
        year($"l_shipdate").cast("long").cast("string").as("v_year"))
    val melted = base.selectExpr("page", "l_orderkey", "l_linenumber",
      "stack(5, 'flag', v_flag, 'status', v_status, 'qty', v_qty, " +
        "'disc', v_disc, 'year', v_year) AS (col_name, val)")
    // (orderkey, linenumber) is NOT unique in the fixture (dup pairs) —
    // close the order with the value itself so the run census is
    // engine-deterministic (equal keys cluster, which an encoder's
    // sort-within-page would do anyway)
    val w = Window.partitionBy($"col_name", $"page")
      .orderBy($"l_orderkey", $"l_linenumber", $"val")
    val marked = melted.withColumn("chg",
      when(lag($"val", 1).over(w).isNull || lag($"val", 1).over(w) =!= $"val", 1L)
        .otherwise(0L))
    val stats = marked.groupBy($"col_name").agg(
      count(lit(1)).as("n"), sum(length($"val").cast("long")).as("sum_len"),
      max(length($"val").cast("long")).as("wmax"), sum($"chg").as("runs"))
    val dist = melted.select($"col_name", $"val").distinct()
      .groupBy($"col_name").agg(
        count(lit(1)).as("ndv"), sum(length($"val").cast("long")).as("sum_dlen"))
    val bw = when($"ndv" <= 2L, 1L).when($"ndv" <= 4L, 2L).when($"ndv" <= 16L, 4L)
      .when($"ndv" <= 256L, 8L).when($"ndv" <= 65536L, 16L).otherwise(32L)
    stats.join(dist, "col_name")
      .withColumn("bw", bw)
      .withColumn("plain_b", $"sum_len" + lit(4L) * $"n")
      .withColumn("dict_b",
        $"sum_dlen" + lit(4L) * $"ndv" + expr("(n * bw + 7) DIV 8"))
      .withColumn("rle_b", $"runs" * ($"wmax" + lit(4L)))
      .select($"col_name", $"n", $"ndv", $"runs", $"plain_b", $"dict_b", $"rle_b",
        when($"dict_b" <= $"rle_b" && $"dict_b" <= $"plain_b", "dict")
          .when($"rle_b" <= $"plain_b", "rle").otherwise("plain").as("best"))
      .orderBy($"col_name")
  }

  // bw needs to exist as a column before dict_b's expr() references it —
  // restated here for the oracle as an inline CASE.
  private val bwSql =
    """CASE WHEN ndv <= 2 THEN 1 WHEN ndv <= 4 THEN 2 WHEN ndv <= 16 THEN 4
      |     WHEN ndv <= 256 THEN 8 WHEN ndv <= 65536 THEN 16 ELSE 32 END""".stripMargin

  private val encodingAdvisorOracle = {
    val melts = Seq("flag" -> "v_flag", "status" -> "v_status", "qty" -> "v_qty",
      "disc" -> "v_disc", "year" -> "v_year").map { case (nm, c) =>
      s"SELECT page, l_orderkey, l_linenumber, '$nm' AS col_name, $c AS val FROM base"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT l_orderkey, l_linenumber, l_orderkey // $PageOrders AS page,
       |         l_returnflag AS v_flag, l_linestatus AS v_status,
       |         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v_qty,
       |         CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS VARCHAR) AS v_disc,
       |         CAST(CAST(year(l_shipdate) AS BIGINT) AS VARCHAR) AS v_year
       |  FROM lineitem),
       |melted AS MATERIALIZED (
       |  $melts),
       |marked AS (
       |  SELECT col_name, val,
       |         CASE WHEN lag(val) OVER (PARTITION BY col_name, page
       |                ORDER BY l_orderkey, l_linenumber, val) IS DISTINCT FROM val
       |              THEN 1 ELSE 0 END AS chg
       |  FROM melted),
       |stats AS (
       |  SELECT col_name, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(length(val)) AS BIGINT) AS sum_len,
       |         CAST(max(length(val)) AS BIGINT) AS wmax,
       |         CAST(sum(chg) AS BIGINT) AS runs
       |  FROM marked GROUP BY 1),
       |dist AS (
       |  SELECT col_name, CAST(count(*) AS BIGINT) AS ndv,
       |         CAST(sum(length(val)) AS BIGINT) AS sum_dlen
       |  FROM (SELECT DISTINCT col_name, val FROM melted) GROUP BY 1),
       |sized AS (
       |  SELECT s.col_name, s.n, d.ndv, s.runs,
       |         s.sum_len + 4 * s.n AS plain_b,
       |         d.sum_dlen + 4 * d.ndv + (s.n * ($bwSql) + 7) // 8 AS dict_b,
       |         s.runs * (s.wmax + 4) AS rle_b
       |  FROM stats s JOIN dist d USING (col_name))
       |SELECT col_name, n, ndv, runs, plain_b, dict_b, rle_b,
       |       CASE WHEN dict_b <= rle_b AND dict_b <= plain_b THEN 'dict'
       |            WHEN rle_b <= plain_b THEN 'rle' ELSE 'plain' END AS best
       |FROM sized ORDER BY col_name""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x338_encoding_advisor",
      "Columnar encoding advisor: PLAIN/DICT/RLE byte sizing from exact n/NDV/page-local-run censuses, log-free bit widths",
      encodingAdvisor, Some(encodingAdvisorOracle)))
}
