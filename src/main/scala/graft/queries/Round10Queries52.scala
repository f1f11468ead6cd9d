package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fifty-second tier: recursive CTEs (x229) — Spark 4 ships
  * `WITH RECURSIVE`, so the hierarchy roll-up every warehouse needs
  * (org charts, BOMs, account trees) runs as the SAME SQL text in
  * Spark and DuckDB — the query is shared verbatim between the engine
  * and its oracle. */
object Round10Queries52 {

  /** The literal recursive SQL both engines execute: customers hang on
    * a derived decimal tree (parent = ⌊key/10⌋), each leaf walks to
    * its single-digit root division, and revenue rolls up per
    * division. floor(x/10.0) instead of integer div keeps the one
    * arithmetic step spelled identically (and floor-safe) in both
    * dialects. */
  private val rollupSql =
    """WITH RECURSIVE rev AS (
      |  SELECT o_custkey AS k,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |anc AS (
      |  SELECT c_custkey AS leaf, CAST(c_custkey AS BIGINT) AS node,
      |         CAST(0 AS BIGINT) AS depth
      |  FROM customer
      |  UNION ALL
      |  SELECT leaf, CAST(floor(CAST(node AS DOUBLE) / 10.0) AS BIGINT),
      |         depth + 1
      |  FROM anc WHERE node >= 10),
      |tops AS (
      |  SELECT leaf, node AS division, depth
      |  FROM anc WHERE node BETWEEN 0 AND 9)
      |SELECT division,
      |       CAST(count(*) AS BIGINT) AS n_cust,
      |       CAST(max(depth) AS BIGINT) AS max_depth,
      |       CAST(COALESCE(sum(r.cents), 0) AS BIGINT) AS cents
      |FROM tops t LEFT JOIN rev r ON r.k = t.leaf
      |GROUP BY division
      |ORDER BY division""".stripMargin

  /** x229: recursive hierarchy roll-up — see [[rollupSql]]; the Spark
    * side registers the parquet tables as temp views and runs the
    * identical statement the oracle runs. The published panel per
    * root division: member count, tree depth, revenue mass.
    *
    * Scale: the recursion is linear in customers × digits (every node
    * has ONE parent), so each recursive step is a narrow projection of
    * the previous frontier — the plan is `UnionLoop` with
    * per-iteration row counts shrinking to the division roots; no
    * fan-out, no dedup pressure. */
  def recursiveRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(rollupSql)
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x229_recursive_rollup",
      "WITH RECURSIVE hierarchy roll-up (decimal-tree divisions) running the identical SQL text in Spark 4 and DuckDB",
      recursiveRollup, Some(rollupSql)))
}
