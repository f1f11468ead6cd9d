package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 forty-ninth tier: storage-surface semantics, oracle-paired —
  * parquet schema evolution under mergeSchema (q114) and partitioned
  * writes with directory-based partition discovery (q115). Both write
  * real files to a temp dir and verify the READ-BACK against SQL over
  * the source tables, so the storage round-trip itself is the thing
  * being graded (the x168 CSV recipe). */
object Round10Queries49 {

  // ---------------------------------------------------------------- q114

  /** q114: schema evolution — a v1 batch (3 columns) and a v2 batch
    * (adds o_totalprice) land in the same parquet directory;
    * `mergeSchema` unifies them and v1 rows surface NULL for the new
    * column. The published per-status panel proves both halves: row
    * counts add up AND the null mass of the evolved column is exactly
    * the v1 cohort. At 100 TB this is the additive-column migration
    * every long-lived table goes through — the point is that old
    * files never need rewriting.
    *
    * Scale: one filtered write per version (predicate-split cohorts),
    * one merged scan with footer-driven schema union; the aggregate is
    * map-side combined. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_q114").toString
    val orders = Tables.orders(spark, dir)
    // v1: pre-1996 orders, without the price column yet.
    orders.filter(year($"o_orderdate") <= 1995)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .write.mode("append").parquet(s"$base/t")
    // v2: the rest, with the newly added column.
    orders.filter(year($"o_orderdate") >= 1996)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_c"))
      .write.mode("append").parquet(s"$base/t")
    // eager localCheckpoint so the two-version staging dir can be
    // deleted before returning (no disk accumulation across runs)
    val out = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"price_c".isNull, 1L).otherwise(0L)).as("n_v1_rows"),
        coalesce(sum($"price_c"), lit(0L)).as("v2_cents"))
      .localCheckpoint()
    QueryUtil.deleteRecursively(base)
    out.orderBy($"o_orderstatus")
  }

  private val schemaEvolutionOracle =
    """SELECT o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_v1_rows,
      |       CAST(COALESCE(sum(CASE WHEN year(o_orderdate) >= 1996 THEN
      |              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
      |            AS BIGINT) AS v2_cents
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q115

  /** q115: partitioned write + directory discovery — orders written
    * `partitionBy(o_orderpriority)`, then read back from the root so
    * the partition column is RECOVERED from the directory names (it
    * is not in the data files). The published panel per priority:
    * row count and revenue from the read-back, proving the partition
    * values round-tripped and attach to the right rows. The explain'd
    * read prunes to one directory when filtered — the layout q81/x139
    * assume, here actually materialized by the write path.
    *
    * Scale: the write is one shuffle-free dynamic-partition insert
    * (25-way here); discovery cost is directory-listing-bounded, and
    * a filtered read touches one partition's files only. */
  def partitionDiscovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_q115").toString
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
        $"o_orderpriority")
      .write.partitionBy("o_orderpriority").mode("overwrite")
      .parquet(s"$base/t")
    // eager localCheckpoint so the partitioned copy can be deleted
    // before returning (no disk accumulation across runs)
    val out = spark.read.parquet(s"$base/t")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("cents"))
      .localCheckpoint()
    QueryUtil.deleteRecursively(base)
    out.orderBy($"o_orderpriority")
  }

  private val partitionDiscoveryOracle =
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |            AS BIGINT) AS cents
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q114_schema_evolution",
      "parquet mergeSchema evolution: v1 files without the new column, v2 with it; null mass of the evolved column = v1 cohort",
      schemaEvolution, Some(schemaEvolutionOracle)),
    QueryDef("q115_partition_discovery",
      "partitionBy write + directory-based partition recovery: per-priority counts and revenue from the read-back",
      partitionDiscovery, Some(partitionDiscoveryOracle)))
}
