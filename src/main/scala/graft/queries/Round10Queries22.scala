package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 twenty-second tier: three-valued-logic anti-join semantics —
  * the NOT IN null trap as an oracle-paired parity proof. */
object Round10Queries22 {

  /** q111: null-aware anti-join semantics — SQL's most notorious
    * three-valued-logic trap, proven engine-equivalent: `x NOT IN
    * (subquery)` is FALSE-or-UNKNOWN for EVERY x once the subquery
    * contains one NULL (so the filter returns zero rows), while the
    * rewrite everyone intends — NOT EXISTS — ignores the NULLs. The dim
    * key list gets NULLs injected deterministically (nullif on a key
    * band); the query runs BOTH forms over the same data plus the NOT IN
    * form against the null-free list, and emits the three counts. Spark
    * plans the NOT IN as a null-aware anti join (NAAJ) — semantics the
    * optimizer must preserve, not an edge case a rewrite may paper over.
    *
    * Scale: both forms are broadcast anti joins on the dim key set; the
    * NAAJ's extra null check is a per-row predicate, not a plan change. */
  def nullAwareAntijoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    Tables.customer(spark, dir)
      .select(nullif($"c_custkey", lit(5)).as("k"))
      .createOrReplaceTempView("q111_keys_with_null")
    o.createOrReplaceTempView("q111_orders")
    spark.sql(
      """SELECT 'not_exists' AS form, CAST(count(*) AS BIGINT) AS n
        |FROM q111_orders
        |WHERE NOT EXISTS (SELECT 1 FROM q111_keys_with_null k
        |                  WHERE k.k = o_custkey)
        |UNION ALL
        |SELECT 'not_in_with_null', CAST(count(*) AS BIGINT)
        |FROM q111_orders
        |WHERE o_custkey NOT IN (SELECT k FROM q111_keys_with_null)
        |UNION ALL
        |SELECT 'not_in_without_null', CAST(count(*) AS BIGINT)
        |FROM q111_orders
        |WHERE o_custkey NOT IN (SELECT k FROM q111_keys_with_null
        |                        WHERE k IS NOT NULL)
        |ORDER BY form""".stripMargin)
  }

  private val nullAwareAntijoinOracle =
    """WITH keys AS (SELECT nullif(c_custkey, 5) AS k FROM customer)
      |SELECT 'not_exists' AS form, CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = o_custkey)
      |UNION ALL
      |SELECT 'not_in_with_null', CAST(count(*) AS BIGINT)
      |FROM orders WHERE o_custkey NOT IN (SELECT k FROM keys)
      |UNION ALL
      |SELECT 'not_in_without_null', CAST(count(*) AS BIGINT)
      |FROM orders WHERE o_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)
      |ORDER BY form""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q111_null_aware_antijoin",
      "three-valued NOT IN vs NOT EXISTS parity: one NULL in the list empties NOT IN; NAAJ semantics engine-equivalent",
      nullAwareAntijoin, Some(nullAwareAntijoinOracle)))
}
