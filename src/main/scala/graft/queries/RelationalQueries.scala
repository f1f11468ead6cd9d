package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish star schema: scans with
  * pushed filters, broadcast + shuffle joins, semi/anti joins, hash
  * aggregates, distinct aggregates, rollup/cube, window functions, global
  * top-k, set ops, scalar function families, JSON extraction, pivot.
  *
  * Determinism rules (driver hash-compares vs DuckDB): every double that went
  * through a reassociable aggregate is `round(...)`-ed; every result has a
  * total ORDER BY; column names match the oracle SQL exactly.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: hash aggregate with partial (map-side)
    * combine — the canonical "does aggregation scale" plan. 100 TB: one
    * shuffle on the 6-value grouping key; AQE coalesces post-shuffle
    * partitions. */
  def q01(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp_ntz"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Oracle =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style: tight filter + projection — both must reach the parquet
    * scan (PushedFilters / 4-column ReadSchema). */
  def q02(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
          $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .agg(
        round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q02Oracle =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  /** 3-way join: small customer side broadcasts (AQE), lineitem⋈orders is the
    * shuffle join on l_orderkey. 100 TB: co-partition/bucket lineitem and
    * orders on orderkey to make the big join shuffle-free. */
  def q03(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_mktsegment")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"c_mktsegment")
  }

  private val q03Oracle =
    """SELECT c_mktsegment,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Dimension snowflake with explicit broadcast hints (nation: 25 rows,
    * region: 5 rows — never shuffle these). */
  def q04(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), round(sum($"c_acctbal"), 2).as("sum_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  private val q04Oracle =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |       round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Left-semi join (EXISTS): orders with any line shipped in 2001. */
  def q05(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("2001-01-01").cast("timestamp_ntz"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  private val q05Oracle =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate >= TIMESTAMP '2001-01-01')
      |ORDER BY o_orderkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def q06(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q06Oracle =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Window ranking: top-3 orders per customer. Single shuffle on o_custkey
    * shared by the window; deterministic tie-break on o_orderkey. */
  def q07(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  private val q07Oracle =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             row_number() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Window frames: per-customer running total + lag delta over order dates. */
  def q08(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .select(
        $"o_custkey", $"o_orderkey", $"o_orderdate",
        round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
        round($"o_totalprice" - coalesce(lag($"o_totalprice", 1).over(w), lit(0.0)), 2).as("delta_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q08Oracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      |       round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS delta_prev
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Global top-k: plans as TakeOrderedAndProject (no full sort, no single
    * giant partition — the right shape at 100 TB). */
  def q09(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(25)
  }

  private val q09Oracle =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  /** Set operations: EXCEPT + INTERSECT (both distinct-semantics) tagged and
    * unioned. */
  def q10(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val custKeys = Tables.customer(spark, dir).select($"c_custkey".as("key"))
    val ordKeys = Tables.orders(spark, dir).select($"o_custkey".as("key"))
    val onlyCust = custKeys.except(ordKeys).select(lit("only_customer").as("tag"), $"key")
    val both = custKeys.intersect(ordKeys).select(lit("both").as("tag"), $"key")
    onlyCust.unionByName(both).orderBy($"tag", $"key")
  }

  private val q10Oracle =
    """SELECT 'only_customer' AS tag, key
      |FROM (SELECT c_custkey AS key FROM customer EXCEPT SELECT o_custkey AS key FROM orders)
      |UNION ALL
      |SELECT 'both' AS tag, key
      |FROM (SELECT c_custkey AS key FROM customer INTERSECT SELECT o_custkey AS key FROM orders)
      |ORDER BY tag, key""".stripMargin

  /** ROLLUP hierarchy totals; null grouping markers coalesced to 'ALL' so the
    * ordering is engine-stable. */
  def q11(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  private val q11Oracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over two dims of the orders table. */
  def q12(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"sum_price")
      .orderBy($"status", $"priority")
  }

  private val q12Oracle =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Distinct aggregates (expand + two-phase agg in Spark). */
  def q13(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  private val q13Oracle =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** String function family (all codegen'd, all with exact DuckDB parity):
    * upper/lower, length, substr, split_part, lpad, reverse, concat_ws,
    * replace, trim, starts/contains as booleans. */
  def q14(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.part(spark, dir).select(
      $"p_partkey",
      upper($"p_name").as("uname"),
      lower($"p_brand").as("lbrand"),
      length($"p_name").as("name_len"),
      substring($"p_name", 1, 8).as("name_pre"),
      split_part($"p_type", lit(" "), lit(1)).as("type_head"),
      lpad($"p_brand", 12, "#").as("brand_pad"),
      reverse($"p_name").as("name_rev"),
      concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
      regexp_replace($"p_name", lit("[aeiou]"), lit("_")).as("name_novowel"),
      $"p_name".contains("re").cast("int").as("has_re"),
      $"p_name".startsWith("a").cast("int").as("starts_a"))
      .orderBy($"p_partkey")
  }

  private val q14Oracle =
    """SELECT p_partkey,
      |       upper(p_name) AS uname,
      |       lower(p_brand) AS lbrand,
      |       length(p_name) AS name_len,
      |       substr(p_name, 1, 8) AS name_pre,
      |       split_part(p_type, ' ', 1) AS type_head,
      |       lpad(p_brand, 12, '#') AS brand_pad,
      |       reverse(p_name) AS name_rev,
      |       concat_ws('-', p_brand, p_type) AS brand_type,
      |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
      |       CAST(contains(p_name, 're') AS INTEGER) AS has_re,
      |       CAST(starts_with(p_name, 'a') AS INTEGER) AS starts_a
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Date/time function family over a monthly aggregate. */
  def q15(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mon"))
      .agg(
        count(lit(1)).as("n"),
        round(sum($"o_totalprice"), 2).as("sum_price"),
        min(date_format($"o_orderdate", "yyyy-MM-dd")).as("first_day"),
        max(dayofmonth($"o_orderdate")).as("max_dom"))
      .orderBy($"yr", $"mon")
  }

  private val q15Oracle =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |       CAST(month(o_orderdate) AS INTEGER) AS mon,
      |       count(*) AS n,
      |       round(sum(o_totalprice), 2) AS sum_price,
      |       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
      |       CAST(max(day(o_orderdate)) AS INTEGER) AS max_dom
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, mon""".stripMargin

  /** Math function family; every double rounded for cross-engine stability. */
  def q16(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" <= 100)
      .select(
        $"l_orderkey", $"l_linenumber",
        round(abs(-$"l_extendedprice"), 2).as("abs_price"),
        ceil($"l_quantity").cast("long").as("ceil_qty"),
        floor($"l_quantity").cast("long").as("floor_qty"),
        round(sqrt($"l_extendedprice"), 6).as("sqrt_price"),
        round(log($"l_extendedprice" + 1.0), 6).as("ln_price"),
        round(pow($"l_discount", 2), 6).as("disc_sq"),
        ($"l_orderkey" % 7).as("mod7"),
        greatest($"l_quantity", $"l_discount" * 100).as("gr"),
        least($"l_tax", $"l_discount").as("ls"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q16Oracle =
    """SELECT l_orderkey, l_linenumber,
      |       round(abs(-l_extendedprice), 2) AS abs_price,
      |       CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
      |       CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
      |       round(sqrt(l_extendedprice), 6) AS sqrt_price,
      |       round(ln(l_extendedprice + 1.0), 6) AS ln_price,
      |       round(pow(l_discount, 2), 6) AS disc_sq,
      |       l_orderkey % 7 AS mod7,
      |       greatest(l_quantity, l_discount * 100) AS gr,
      |       least(l_tax, l_discount) AS ls
      |FROM lineitem
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** JSON extraction (X5): scalar prop pulled out of the JSON string column,
    * aggregated per event type. */
  def q17(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  private val q17Oracle =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |       CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
      |       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** CASE WHEN bucketing + conditional aggregation (manual pivot — the
    * oracle-stable way to express `groupBy().pivot()`). */
  def q18(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(
        $"o_orderpriority",
        when($"o_totalprice" < 50000, "small")
          .when($"o_totalprice" < 200000, "medium")
          .otherwise("large").as("tier"),
        $"o_totalprice")
      .groupBy($"o_orderpriority")
      .agg(
        count(when($"tier" === "small", 1)).as("n_small"),
        count(when($"tier" === "medium", 1)).as("n_medium"),
        count(when($"tier" === "large", 1)).as("n_large"),
        round(sum(when($"tier" === "large", $"o_totalprice")), 2).as("large_price"))
      .orderBy($"o_orderpriority")
  }

  private val q18Oracle =
    """WITH t AS (
      |  SELECT o_orderpriority,
      |         CASE WHEN o_totalprice < 50000 THEN 'small'
      |              WHEN o_totalprice < 200000 THEN 'medium'
      |              ELSE 'large' END AS tier,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_orderpriority,
      |       count(CASE WHEN tier = 'small' THEN 1 END) AS n_small,
      |       count(CASE WHEN tier = 'medium' THEN 1 END) AS n_medium,
      |       count(CASE WHEN tier = 'large' THEN 1 END) AS n_large,
      |       round(sum(CASE WHEN tier = 'large' THEN o_totalprice END), 2) AS large_price
      |FROM t
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Scalar subquery: orders above the (rounded, hence engine-stable) global
    * average price. */
  def q19(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val avgPrice = ord.agg(round(avg($"o_totalprice"), 2).as("a"))
    ord.join(broadcast(avgPrice))
      .filter($"o_totalprice" > $"a" * 1.5)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(min($"o_totalprice"), 2).as("min_price"))
      .orderBy($"o_orderstatus")
  }

  private val q19Oracle =
    """SELECT o_orderstatus, count(*) AS n, round(min(o_totalprice), 2) AS min_price
      |FROM orders
      |WHERE o_totalprice > (SELECT round(avg(o_totalprice), 2) FROM orders) * 1.5
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Correlated-aggregate pattern (HAVING): customers with >= 15 orders. */
  def q20(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("sum_price"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  private val q20Oracle =
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15
      |ORDER BY o_custkey""".stripMargin

  /** Grouping sets via GROUPING SETS-equivalent union of aggregates: region
    * totals and nation totals for suppliers in one result. */
  def q21(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val base = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
    val byNation = base.groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n"), round(sum($"s_acctbal"), 2).as("sum_bal"))
    val byRegion = base.groupBy($"r_name")
      .agg(count(lit(1)).as("n"), round(sum($"s_acctbal"), 2).as("sum_bal"))
      .select($"r_name", lit("ALL").as("n_name"), $"n", $"sum_bal")
    byNation.select($"r_name", $"n_name", $"n", $"sum_bal")
      .unionByName(byRegion)
      .orderBy($"r_name", $"n_name")
  }

  private val q21Oracle =
    """WITH base AS (
      |  SELECT r_name, n_name, s_acctbal
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT r_name, n_name, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
      |FROM base GROUP BY r_name, n_name
      |UNION ALL
      |SELECT r_name, 'ALL' AS n_name, count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal
      |FROM base GROUP BY r_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Sessionization (X6): 30-minute-gap sessions from the raw event stream —
    * lag-gap flagging + running session index, then per-user session stats.
    * 100 TB: one shuffle on user_id shared by both windows and the final
    * aggregate; skewed users would get salted pre-aggregation. */
  def q22(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val flagged = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id",
        when(unix_timestamp($"ts".cast("timestamp")) - unix_timestamp(lag($"ts", 1).over(w).cast("timestamp")) > 1800, 1)
          .otherwise(0).as("brk"))
    val sessions = flagged
      .withColumn("sess", sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy($"user_id")
      .agg(
        (max($"sess") + 1).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  private val q22Oracle =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |                   - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sessions AS (
      |  SELECT user_id,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM flagged)
      |SELECT user_id, CAST(max(sess) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM sessions
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", "TPC-H Q1-style hash aggregate with partial combine", q01, Some(q01Oracle)),
    QueryDef("q02_filter_pushdown", "Q6-style filter+projection pushed to parquet scan", q02, Some(q02Oracle)),
    QueryDef("q03_join_agg", "3-way join (broadcast dim + shuffle fact) with aggregation", q03, Some(q03Oracle)),
    QueryDef("q04_broadcast_snowflake", "explicit broadcast joins over dim snowflake", q04, Some(q04Oracle)),
    QueryDef("q05_semi_join", "left-semi join (EXISTS)", q05, Some(q05Oracle)),
    QueryDef("q06_anti_join", "left-anti join (NOT EXISTS)", q06, Some(q06Oracle)),
    QueryDef("q07_window_topk_group", "row_number window, top-3 per customer", q07, Some(q07Oracle)),
    QueryDef("q08_window_frames", "running sum + lag over explicit frame", q08, Some(q08Oracle)),
    QueryDef("q09_global_topk", "global top-k (TakeOrderedAndProject)", q09, Some(q09Oracle)),
    QueryDef("q10_set_ops", "EXCEPT + INTERSECT + UNION ALL", q10, Some(q10Oracle)),
    QueryDef("q11_rollup", "ROLLUP hierarchy totals", q11, Some(q11Oracle)),
    QueryDef("q12_cube", "CUBE over two dimensions", q12, Some(q12Oracle)),
    QueryDef("q13_distinct_agg", "multiple COUNT(DISTINCT) per group", q13, Some(q13Oracle)),
    QueryDef("q14_string_funcs", "string scalar function family", q14, Some(q14Oracle)),
    QueryDef("q15_date_funcs", "date/time function family, monthly rollup", q15, Some(q15Oracle)),
    QueryDef("q16_math_funcs", "math scalar function family", q16, Some(q16Oracle)),
    QueryDef("q17_json_extract", "JSON scalar extraction + aggregate (X5)", q17, Some(q17Oracle)),
    QueryDef("q18_case_pivot", "CASE bucketing + conditional aggregation (manual pivot)", q18, Some(q18Oracle)),
    QueryDef("q19_scalar_subquery", "broadcast scalar subquery filter", q19, Some(q19Oracle)),
    QueryDef("q20_having", "grouped HAVING filter", q20, Some(q20Oracle)),
    QueryDef("q21_grouping_union", "multi-granularity aggregates unioned", q21, Some(q21Oracle)),
    QueryDef("q22_sessionize", "lag-gap sessionization over event stream (X6)", q22, Some(q22Oracle)))
}
