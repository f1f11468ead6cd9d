package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 twenty-first tier: the two SQL-surface corners that break
  * real warehouse migrations — BAG-semantics set operations
  * (INTERSECT ALL / EXCEPT ALL multiplicity rules) and null-handling
  * semantics (null-safe equality joins, null group keys, count(col) vs
  * count(*), explicit NULLS FIRST/LAST ordering — where Spark's and
  * DuckDB's DEFAULTS actually differ, so the pin uses explicit
  * spellings). Both run Spark's BUILTIN operators against census
  * integer arithmetic in the oracle.
  */
object Round11Queries21 {

  /** High-value threshold (exact cents) for the B multiset. */
  private val HighCents = 15000000L

  // ---------------------------------------------------------------- x287

  /** x287: bag-semantics set operations — A = (custkey, year) of URGENT
    * orders, B = same projection of high-value orders (both genuine
    * multisets: a customer repeats within a year). Spark's
    * `intersectAll` / `exceptAll` / `unionAll` / `intersect` /
    * `except` run as the operators; the oracle derives every count
    * from the per-key (c₁, c₂) census: |A ∩all B| = Σ min(c₁,c₂),
    * |A −all B| = Σ max(c₁−c₂,0), distinct variants from existence
    * flags. Exactly the multiplicity rules ANSI prescribes — and the
    * first thing to silently drift in a migration.
    *
    * Scale: two scans + one key census; the operators themselves
    * hash-shuffle once on the projected key. */
  def bagSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir)
      .select($"o_custkey".cast("long").as("ck"),
        year($"o_orderdate").cast("long").as("yr"),
        $"o_orderpriority".as("pr"),
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"))
      .localCheckpoint(true)
    val a = base.filter($"pr" === "1-URGENT").select($"ck", $"yr")
    val b = base.filter($"cents" >= HighCents).select($"ck", $"yr")
    // every metric is a 1-row aggregate frame — no driver-side actions
    def m(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt")).select(lit(name).as("metric"), $"cnt")
    Seq(
      m("n_a", a), m("n_b", b),
      m("intersect_all", a.intersectAll(b)),
      m("except_all", a.exceptAll(b)),
      m("intersect_distinct", a.intersect(b)),
      m("except_distinct", a.except(b)),
      m("union_all", a.unionAll(b)),
      m("union_distinct", a.union(b).distinct()))
      .reduce(_ unionByName _)
      .orderBy($"metric")
  }

  private val bagSetOpsOracle =
    s"""WITH base AS MATERIALIZED (
       |  SELECT CAST(o_custkey AS BIGINT) AS ck,
       |         CAST(year(o_orderdate) AS BIGINT) AS yr,
       |         o_orderpriority AS pr,
       |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM orders),
       |ca AS (SELECT ck, yr, CAST(count(*) AS BIGINT) AS c1
       |       FROM base WHERE pr = '1-URGENT' GROUP BY 1, 2),
       |cb AS (SELECT ck, yr, CAST(count(*) AS BIGINT) AS c2
       |       FROM base WHERE cents >= $HighCents GROUP BY 1, 2),
       |census AS MATERIALIZED (
       |  SELECT COALESCE(ca.ck, cb.ck) AS ck, COALESCE(ca.yr, cb.yr) AS yr,
       |         COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
       |  FROM ca FULL OUTER JOIN cb ON ca.ck = cb.ck AND ca.yr = cb.yr)
       |SELECT metric, cnt FROM (
       |  SELECT 'n_a' AS metric, CAST(sum(c1) AS BIGINT) AS cnt FROM census
       |  UNION ALL SELECT 'n_b', CAST(sum(c2) AS BIGINT) FROM census
       |  UNION ALL SELECT 'intersect_all', CAST(sum(least(c1, c2)) AS BIGINT)
       |    FROM census
       |  UNION ALL SELECT 'except_all', CAST(sum(greatest(c1 - c2, 0)) AS BIGINT)
       |    FROM census
       |  UNION ALL SELECT 'intersect_distinct',
       |    CAST(sum(CASE WHEN c1 > 0 AND c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM census
       |  UNION ALL SELECT 'except_distinct',
       |    CAST(sum(CASE WHEN c1 > 0 AND c2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM census
       |  UNION ALL SELECT 'union_all', CAST(sum(c1 + c2) AS BIGINT) FROM census
       |  UNION ALL SELECT 'union_distinct',
       |    CAST(sum(CASE WHEN c1 + c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM census)
       |ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- x288

  /** x288: null-semantics pins. Frames with REAL null keys (nationkey
    * nulled where the account balance is negative): (1) inner equi-join
    * drops null keys on both sides; (2) the null-safe join (Spark `<=>`,
    * SQL `IS NOT DISTINCT FROM`) additionally matches null-to-null as
    * a full partner-pair product; (3) GROUP BY keeps a null group and
    * `count(col)` skips nulls while `count(*)` doesn't; (4) ordering is
    * pinned with EXPLICIT `NULLS FIRST`/`NULLS LAST` — because the
    * engines' ASC DEFAULTS genuinely differ (Spark: nulls first,
    * DuckDB: nulls last), the exact trap this query exists to catch.
    *
    * Scale: broadcast-dim joins + one census; null semantics cost
    * nothing, getting them wrong costs a migration. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select(when($"c_acctbal" >= 0.0, $"c_nationkey".cast("long")).as("k"))
      .localCheckpoint(true)
    val supp = Tables.supplier(spark, dir)
      .select(when($"s_suppkey" % 7 === 0L, lit(null).cast("long"))
        .otherwise($"s_nationkey".cast("long")).as("k2"))
      .localCheckpoint(true)
    // every metric is a 1-row frame — no driver-side actions
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("val"))
        .select(lit(name).as("metric"), $"val")
    val first = (name: String, ord: org.apache.spark.sql.Column) =>
      cust.orderBy(ord).limit(1)
        .select(lit(name).as("metric"), coalesce($"k", lit(-1L)).as("val"))
    Seq(
      cnt("inner_join", cust.join(supp, $"k" === $"k2")),
      cnt("nullsafe_join", cust.join(supp, $"k" <=> $"k2")),
      cnt("null_group_size", cust.filter($"k".isNull)),
      cnt("count_star", cust),
      cust.agg(count($"k").as("val"))
        .select(lit("count_col").as("metric"), $"val"),
      first("first_nulls_first", $"k".asc_nulls_first),
      first("first_nulls_last", $"k".asc_nulls_last))
      .reduce(_ unionByName _)
      .orderBy($"metric")
  }

  private val nullSemanticsOracle =
    """WITH cust AS MATERIALIZED (
      |  SELECT CASE WHEN c_acctbal >= 0.0 THEN CAST(c_nationkey AS BIGINT)
      |         END AS k
      |  FROM customer),
      |supp AS MATERIALIZED (
      |  SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
      |              ELSE CAST(s_nationkey AS BIGINT) END AS k2
      |  FROM supplier)
      |SELECT metric, val FROM (
      |  SELECT 'inner_join' AS metric,
      |         (SELECT CAST(count(*) AS BIGINT) FROM cust JOIN supp ON k = k2)
      |           AS val
      |  UNION ALL SELECT 'nullsafe_join',
      |    (SELECT CAST(count(*) AS BIGINT) FROM cust JOIN supp
      |     ON k IS NOT DISTINCT FROM k2)
      |  UNION ALL SELECT 'null_group_size',
      |    (SELECT CAST(count(*) AS BIGINT) FROM cust WHERE k IS NULL)
      |  UNION ALL SELECT 'count_star', (SELECT CAST(count(*) AS BIGINT) FROM cust)
      |  UNION ALL SELECT 'count_col', (SELECT CAST(count(k) AS BIGINT) FROM cust)
      |  UNION ALL SELECT 'first_nulls_first',
      |    (SELECT COALESCE(k, -1) FROM cust ORDER BY k ASC NULLS FIRST LIMIT 1)
      |  UNION ALL SELECT 'first_nulls_last',
      |    (SELECT COALESCE(k, -1) FROM cust ORDER BY k ASC NULLS LAST LIMIT 1))
      |ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x287_bag_setops",
      "INTERSECT ALL / EXCEPT ALL multiplicity semantics vs per-key census arithmetic",
      bagSetOps, Some(bagSetOpsOracle)),
    QueryDef("x288_null_semantics",
      "null-safe joins, null groups, count(col) vs count(*), explicit NULLS FIRST/LAST",
      nullSemantics, Some(nullSemanticsOracle)))
}
