package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 twentieth tier: order-independent cross-engine table
  * checksums — the migration-validation primitive the reference's
  * warehouse-ETL domain lives on: "is the table I loaded EXACTLY the
  * table you have?", answered with two commutative folds (XOR and a
  * mod-p sum) over canonical per-row hashes, so ANY engine, partition
  * layout, or row order produces the same signature. The canonical row
  * rendering uses only integer/string normalizations (cents, epoch
  * days) — never float-to-string, which differs across engines.
  */
object Round11Queries20 {

  private val SumMod = 1000000007L

  // ---------------------------------------------------------------- x286

  /** x286: table fingerprints for orders and lineitem. Per row, a
    * canonical '|'-joined string of normalized columns (ids, exact
    * cents, epoch days, enums) hashed to a 60-bit integer (15 md5 hex
    * chars — below 2⁶³ so no sign trouble in either engine); per table,
    * two order-free signatures: `bit_xor` of hashes and `sum(h mod p)
    * mod p`. The Spark side computes each signature TWICE — once on the
    * natural scan order and once after an adversarial
    * `repartition(17)` reshuffle — and emits the match flag: the
    * signature's order-independence is asserted inside the result, and
    * the DuckDB oracle independently reproduces the same signatures
    * from the same parquet bytes (the actual cross-engine migration
    * check).
    *
    * Scale: one narrow projection + one all-commutative aggregate per
    * table — checksumming 100 TB is a single map-side-combining pass,
    * and signatures from disjoint shards COMPOSE (xor and mod-sum are
    * both associative-commutative), so per-partition signatures roll up
    * without re-reading data. */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def h(canon: Column): Column =
      conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    def sig(df: DataFrame, table: String): DataFrame = {
      val hashed = df.withColumn("h", h($"canon"))
      def fold(x: DataFrame) = x.agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_sig"),
        (sum($"h" % SumMod) % SumMod).as("sum_sig"))
      fold(hashed).withColumn("table", lit(table))
        .crossJoin(broadcast(fold(hashed.repartition(17))
          .select($"xor_sig".as("xor_sig2"), $"sum_sig".as("sum_sig2"))))
        .select($"table", $"n_rows", $"xor_sig", $"sum_sig",
          ($"xor_sig" === $"xor_sig2" && $"sum_sig" === $"sum_sig2")
            .cast("long").as("order_independent"))
    }
    val orders = Tables.orders(spark, dir).select(concat_ws("|",
      $"o_orderkey", $"o_custkey",
      floor($"o_totalprice" * 100.0 + 0.5).cast("long"),
      datediff(to_date($"o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01"))),
      $"o_orderpriority").as("canon"))
    val lineitem = Tables.lineitem(spark, dir).select(concat_ws("|",
      $"l_orderkey", $"l_linenumber",
      floor($"l_extendedprice" * 100.0 + 0.5).cast("long"),
      $"l_quantity".cast("long"), $"l_returnflag", $"l_linestatus").as("canon"))
    sig(orders, "orders").unionByName(sig(lineitem, "lineitem"))
      .orderBy($"table")
  }

  private val tableChecksumOracle = {
    def hSql(canon: String): String = {
      // 15 md5 hex chars -> BIGINT (the h16Sql recipe widened to 60 bits)
      val md = s"md5($canon)"
      (1 to 15).map(i => s"(strpos('0123456789abcdef', substr($md, $i, 1)) - 1)")
        .reduce((a, b) => s"($a * 16 + $b)")
    }
    val ordersCanon =
      """concat_ws('|', o_orderkey, o_custkey,
        |      CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
        |      datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)),
        |      o_orderpriority)""".stripMargin
    val lineitemCanon =
      """concat_ws('|', l_orderkey, l_linenumber,
        |      CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT),
        |      CAST(l_quantity AS BIGINT), l_returnflag, l_linestatus)""".stripMargin
    s"""WITH oh AS (SELECT ${hSql(ordersCanon)} AS h FROM orders),
       |lh AS (SELECT ${hSql(lineitemCanon)} AS h FROM lineitem),
       |sigs AS (
       |  SELECT 'orders' AS "table", CAST(count(*) AS BIGINT) AS n_rows,
       |         CAST(bit_xor(h) AS BIGINT) AS xor_sig,
       |         CAST(sum(h % $SumMod) % $SumMod AS BIGINT) AS sum_sig
       |  FROM oh
       |  UNION ALL
       |  SELECT 'lineitem', CAST(count(*) AS BIGINT),
       |         CAST(bit_xor(h) AS BIGINT),
       |         CAST(sum(h % $SumMod) % $SumMod AS BIGINT)
       |  FROM lh)
       |SELECT "table", n_rows, xor_sig, sum_sig,
       |       CAST(1 AS BIGINT) AS order_independent
       |FROM sigs
       |ORDER BY "table"""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x286_table_checksum",
      "order-independent table fingerprints (xor + mod-p sum of canonical row hashes) cross-engine",
      tableChecksum, Some(tableChecksumOracle)))
}
