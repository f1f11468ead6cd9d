package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth coverage batch: RANGE window frames, bag-semantics set ops,
  * null-handling (na.fill/na.drop surface), reproducible hash sampling,
  * and edit distance. */
object RelationalQueries4 {

  /** RANGE frame over a numeric order (30-day trailing revenue per
    * customer) plus lead/nth_value — the frame kinds q08 didn't cover.
    * Epoch seconds as the range key so the frame bound is engine-stable. */
  def q33(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val sec = unix_timestamp($"o_orderdate".cast("timestamp"))
    val wRange = Window.partitionBy($"o_custkey").orderBy($"osec")
      .rangeBetween(-30L * 86400, 0)
    val wRow = Window.partitionBy($"o_custkey").orderBy($"osec", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("osec", sec)
      .select(
        $"o_custkey", $"o_orderkey",
        round(sum($"o_totalprice").over(wRange), 2).as("trailing30d"),
        lead($"o_orderkey", 1).over(wRow).as("next_order"),
        nth_value($"o_orderkey", 2).over(
          wRow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("second_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q33Oracle =
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY osec
      |                                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS trailing30d,
      |       lead(o_orderkey, 1) OVER w AS next_order,
      |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY osec, o_orderkey
      |                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
      |FROM (SELECT *, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY osec, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep multiplicity
    * (q10 covered the distinct variants). Built over l_suppkey multisets. */
  def q34(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val a = Tables.lineitem(spark, dir).filter($"l_orderkey" % 2 === 0).select($"l_suppkey".as("k"))
    val b = Tables.lineitem(spark, dir).filter($"l_orderkey" % 3 === 0).select($"l_suppkey".as("k"))
    val exceptAll = a.exceptAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), $"k", $"n")
    val intersectAll = a.intersectAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), $"k", $"n")
    exceptAll.unionByName(intersectAll).orderBy($"op", $"k")
  }

  private val q34Oracle =
    """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey % 2 = 0),
      |b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey % 3 = 0)
      |SELECT 'except_all' AS op, k, count(*) AS n
      |FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
      |UNION ALL
      |SELECT 'intersect_all' AS op, k, count(*) AS n
      |FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
      |ORDER BY op, k""".stripMargin

  /** Null handling via the DataFrameNaFunctions surface: inject nulls,
    * then na.fill defaults and na.drop filtering. */
  def q35(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val withNulls = Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 400)
      .select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("status"),
        when($"o_totalprice" > 100000, $"o_totalprice").as("big_price"))
    val filled = withNulls.na.fill(Map("status" -> "OPEN", "big_price" -> 0.0))
      .withColumnRenamed("status", "status_filled")
      .withColumnRenamed("big_price", "big_price_filled")
    val kept = withNulls.na.drop(Seq("big_price"))
      .select($"o_orderkey").withColumn("survived_drop", lit(1))
    filled.join(kept, Seq("o_orderkey"), "left")
      .na.fill(Map("survived_drop" -> 0))
      .orderBy($"o_orderkey")
  }

  private val q35Oracle =
    """WITH w AS (SELECT o_orderkey,
      |             nullif(o_orderstatus, 'O') AS status,
      |             CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big_price
      |           FROM orders WHERE o_orderkey <= 400)
      |SELECT o_orderkey,
      |       coalesce(status, 'OPEN') AS status_filled,
      |       coalesce(big_price, 0.0) AS big_price_filled,
      |       CAST(big_price IS NOT NULL AS INTEGER) AS survived_drop
      |FROM w
      |ORDER BY o_orderkey""".stripMargin

  /** Reproducible sampling: hash-based Bernoulli (~10%) — unlike
    * df.sample, identical across engines, partitionings, and reruns; the
    * scalable way to carve deterministic subsets at 100 TB. */
  def q36(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(substring(md5(concat_ws("|", $"l_orderkey", $"l_linenumber")), 1, 2) < "1a")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  private val q36Oracle =
    """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |WHERE substr(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Edit distance on the LSH candidate pairs' text prefixes (string
    * similarity family; DuckDB and Spark share the unit-cost Levenshtein
    * definition). */
  def x48(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", substring($"text", 1, 60).as("pre"))
    val pairs = DedupQueries.minhashLsh(spark, dir).select($"a", $"b")
    pairs
      .join(docs.select($"doc_id".as("a"), $"pre".as("pa")), "a")
      .join(docs.select($"doc_id".as("b"), $"pre".as("pb")), "b")
      .select($"a", $"b", levenshtein($"pa", $"pb").as("edit_dist"))
      .orderBy("a", "b")
  }

  private val x48Oracle =
    DedupQueries.minhashCtes("WITH") +
      """, docs AS (SELECT doc_id, substr(text, 1, 60) AS pre FROM documents)
        |SELECT p.a, p.b, CAST(levenshtein(da.pre, db.pre) AS INTEGER) AS edit_dist
        |FROM (SELECT a, b FROM j WHERE jaccard >= 0.5) p
        |JOIN docs da ON da.doc_id = p.a
        |JOIN docs db ON db.doc_id = p.b
        |ORDER BY p.a, p.b""".stripMargin

  /** Native DataFrame pivot API (fixed value list -> stable columns;
    * q18 is the manual CASE equivalent). */
  def q37(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum($"l_quantity"), 2))
      .orderBy($"l_linestatus")
  }

  private val q37Oracle =
    """SELECT l_linestatus,
      |       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
      |       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
      |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Native unpivot/melt API (wide -> long). */
  def q38(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey", $"p_size".cast("double").as("size"),
        $"p_retailprice".as("retailprice"))
      .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"), "metric", "value")
      .select($"p_partkey", $"metric", round($"value", 2).as("value"))
      .orderBy($"p_partkey", $"metric")
  }

  private val q38Oracle =
    """SELECT p_partkey, metric, round(value, 2) AS value
      |FROM (
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part)
      |ORDER BY p_partkey, metric""".stripMargin

  /** Correlated EXISTS: customers with any 300k+ order. Catalyst
    * decorrelates to a left-semi join — the subquery never executes
    * per-row (`.explain` shows LeftSemi on o_custkey). */
  def q39(spark: SparkSession, dir: String) = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q39Oracle =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Correlated SCALAR subquery: per-order item count. Decorrelates to an
    * aggregate + left outer join (coalesce for orders absent from
    * lineitem). */
  def q40(spark: SparkSession, dir: String) = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
        |       coalesce((SELECT count(*) FROM lineitem_v l
        |                 WHERE l.l_orderkey = o.o_orderkey), 0) AS n_items
        |FROM orders_v o
        |WHERE o_orderkey <= 400
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val q40Oracle =
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
      |       coalesce((SELECT count(*) FROM lineitem l
      |                 WHERE l.l_orderkey = o.o_orderkey), 0) AS n_items
      |FROM orders o
      |WHERE o_orderkey <= 400
      |ORDER BY o_orderkey""".stripMargin

  /** Higher-order array functions (exists / forall / filter / aggregate /
    * zip_with) over the embedding column. Folds are sequential
    * left-to-right with double casts — the exact arithmetic the oracle's
    * list_sum(list_transform(...)) reproduces (same pattern proven by the
    * cosine queries). Coverage query, not a hot path — interpreted lambdas
    * are fine at one pass per row. */
  def q41(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val e = $"embedding"
    Tables.embeddings(spark, dir).select(
      $"vec_id",
      exists(e, x => x.cast("double") > 0.2).cast("int").as("has_big"),
      forall(e, x => abs(x.cast("double")) <= lit(1.0)).cast("int").as("all_bounded"),
      size(filter(e, x => x.cast("double") < 0)).as("n_neg"),
      round(aggregate(e, lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("sum_elems"),
      round(aggregate(zip_with(e, reverse(e), (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x), 4).as("rev_dot"))
      .orderBy("vec_id")
  }

  private val q41Oracle =
    """SELECT vec_id,
      |       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0 AS INTEGER) AS has_big,
      |       CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) <= 1.0)) = len(embedding) AS INTEGER) AS all_bounded,
      |       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 0)) AS INTEGER) AS n_neg,
      |       round(coalesce(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 0.0), 4) AS sum_elems,
      |       round(coalesce(list_sum(list_transform(range(1, len(embedding) + 1),
      |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE))), 0.0), 4) AS rev_dot
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** FULL OUTER join with null-completion: per-nation customer and
    * supplier aggregates joined over an asymmetric key space (the fixture
    * has customer-only nations at every SF), counts coalesced to 0, avgs
    * left null where a side is absent. Completes the join-type surface
    * (inner/broadcast q03-q04, semi q05, anti q06, left x58's audit,
    * as-of x60, range x61). */
  def q42(spark: SparkSession, dir: String) = {
    import spark.implicits._
    // Money sums quantize to exact integer cents per row BEFORE the sum
    // (half-up, identical in both engines), so the aggregate is an
    // accumulation-order-free BIGINT — a raw double avg could drift an
    // ulp between Spark's partitioned merge and DuckDB's sequential scan
    // and flip the .xx5 rounding boundary this fixture actually hits.
    def centsAvg(bal: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      QueryUtil.halfUp(sum(floor(bal * 100 + lit(0.5))).cast("double") / 100.0 / n.cast("double"), 2)
    val c = Tables.customer(spark, dir).groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        centsAvg($"c_acctbal", count(lit(1))).as("avg_cust_bal"))
    val s = Tables.supplier(spark, dir).groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        centsAvg($"s_acctbal", count(lit(1))).as("avg_supp_bal"))
    c.join(s, $"c_nationkey" === $"s_nationkey", "full")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        $"avg_cust_bal",
        coalesce($"n_supp", lit(0L)).as("n_supp"),
        $"avg_supp_bal")
      .orderBy("nationkey")
  }

  private val q42Oracle =
    """WITH c AS (SELECT c_nationkey, count(*) AS n_cust,
      |             floor((CAST(sum(floor(c_acctbal * 100 + 0.5)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE)) * 100 + 0.5) / 100.0 AS avg_cust_bal
      |           FROM customer GROUP BY c_nationkey),
      |s AS (SELECT s_nationkey, count(*) AS n_supp,
      |        floor((CAST(sum(floor(s_acctbal * 100 + 0.5)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE)) * 100 + 0.5) / 100.0 AS avg_supp_bal
      |      FROM supplier GROUP BY s_nationkey)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |       coalesce(n_cust, 0) AS n_cust,
      |       avg_cust_bal,
      |       coalesce(n_supp, 0) AS n_supp,
      |       avg_supp_bal
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Time-bucketed resampling (the downsample-to-bars shape): hourly
    * buckets per event type with count, volume, and OHLC-style first/last/
    * min/max values — first/last picked by deterministic (ts, event_id)
    * row_numbers, not by order-dependent first()/last() aggregates. */
  def q43(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"bucket", $"event_type")
    Tables.events(spark, dir)
      .select(date_trunc("hour", $"ts").as("bucket"), $"event_type",
        $"value", $"ts", $"event_id")
      .withColumn("rn_first", row_number().over(w.orderBy($"ts", $"event_id")))
      .withColumn("rn_last", row_number().over(w.orderBy($"ts".desc, $"event_id".desc)))
      .groupBy($"bucket", $"event_type")
      .agg(
        count(lit(1)).as("n"),
        QueryUtil.halfUp(
          sum(floor($"value" * 1e6 + lit(0.5))).cast("double") / 1e6, 2).as("volume"),
        max(when($"rn_first" === 1, $"value")).as("open"),
        max(when($"rn_last" === 1, $"value")).as("close"),
        min($"value").as("lo"),
        max($"value").as("hi"))
      .orderBy("bucket", "event_type")
  }

  private val q43Oracle =
    """WITH b AS (SELECT date_trunc('hour', ts) AS bucket, event_type, value, ts, event_id
      |           FROM events),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY bucket, event_type ORDER BY ts, event_id) AS rn_first,
      |        row_number() OVER (PARTITION BY bucket, event_type ORDER BY ts DESC, event_id DESC) AS rn_last
      |      FROM b)
      |SELECT bucket, event_type,
      |       count(*) AS n,
      |       floor((CAST(sum(floor(value * 1000000.0 + 0.5)) AS BIGINT) / 1000000.0) * 100 + 0.5) / 100.0 AS volume,
      |       max(CASE WHEN rn_first = 1 THEN value END) AS open,
      |       max(CASE WHEN rn_last = 1 THEN value END) AS close,
      |       min(value) AS lo,
      |       max(value) AS hi
      |FROM r
      |GROUP BY bucket, event_type
      |ORDER BY bucket, event_type""".stripMargin

  /** Ordered-funnel analysis with a 24-hour conversion window: how many
    * users progress view → click → purchase IN ORDER, each stage strictly
    * after the previous stage's earliest completion and within 24h of it
    * (fixed-duration interval — month-length interval arithmetic diverges
    * across engines, hour arithmetic does not). The earliest-chain
    * semantics make the result order-independent: stage k is reached iff
    * min(ts of step k inside the window) exists. Three small aggregates
    * left-joined onto the user dimension — no sessionization state. */
  def q44(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"event_type", $"ts")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val win = expr("INTERVAL 24 HOURS")
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"t1" && $"ts" <= $"t1" + win)
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"t2" && $"ts" <= $"t2" + win)
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    ev.select($"user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        when($"t3".isNotNull, 3).when($"t2".isNotNull, 2)
          .when($"t1".isNotNull, 1).otherwise(0).as("stage"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  private val q44Oracle =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |t1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts) AS t2
      |       FROM events e JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > t1.t1
      |         AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN t2 ON e.user_id = t2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |         AND e.ts <= t2.t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
      |s AS (SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
      |                  WHEN t2.t2 IS NOT NULL THEN 2
      |                  WHEN t1.t1 IS NOT NULL THEN 1
      |                  ELSE 0 END AS stage
      |      FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
      |             LEFT JOIN t2 ON u.user_id = t2.user_id
      |             LEFT JOIN t3 ON u.user_id = t3.user_id)
      |SELECT stage, count(*) AS n_users FROM s GROUP BY stage ORDER BY stage""".stripMargin

  /** Cohort retention: users grouped by their first-active day, activity
    * counted per week offset — the classic retention triangle. Activity
    * reduces to distinct (user, day) pairs first, so the heavy table is
    * touched once and the join carries one row per active day. */
  def q45(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val act = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohort = act.groupBy($"user_id").agg(min($"d").as("c0"))
    act.join(cohort, "user_id")
      .select($"user_id", $"c0", floor(datediff($"d", $"c0") / 7).cast("int").as("wk"))
      .distinct()
      .groupBy($"c0", $"wk").agg(count(lit(1)).as("active"))
      .orderBy($"c0", $"wk")
  }

  private val q45Oracle =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, min(d) AS c0 FROM act GROUP BY user_id),
      |w AS (SELECT DISTINCT act.user_id, c.c0,
      |        CAST(date_diff('day', c.c0, act.d) // 7 AS INTEGER) AS wk
      |      FROM act JOIN c ON act.user_id = c.user_id)
      |SELECT c0, wk, count(*) AS active
      |FROM w
      |GROUP BY c0, wk
      |ORDER BY c0, wk""".stripMargin

  /** Rolling 7-day distinct actives (WAU) per day, alongside same-day
    * distinct actives (DAU). Exact rolling distinct is NOT a window sum of
    * daily counts (users overlap across days), so each distinct (user, day)
    * activity is exploded to the <= 7 window-days it contributes to, then
    * deduped and counted per window-day — a bounded 7x row expansion and
    * two keyed shuffles, instead of the per-day set-union a window
    * function would need (no per-group state, no O(days) frames). 100 TB:
    * the expansion factor is the window length, constant; both shuffles
    * key on high-cardinality (user, day) / day. */
  def q46(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val act = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val span = act.agg(max($"d").as("dmax"))
    val contrib = act.crossJoin(broadcast(span))
      .select($"user_id",
        explode(sequence($"d", least(date_add($"d", 6), $"dmax"))).as("day"))
      .distinct()
    val wau = contrib.groupBy($"day").agg(count(lit(1)).as("wau7"))
    val dau = act.groupBy($"d".as("day")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .select($"day", coalesce($"dau", lit(0L)).as("dau"), $"wau7")
      .orderBy($"day")
  }

  private val q46Oracle =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |span AS (SELECT max(d) AS dmax FROM act),
      |contrib AS (SELECT DISTINCT user_id,
      |        CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
      |                                    CAST(least(d + 6, dmax) AS TIMESTAMP),
      |                                    INTERVAL 1 DAY)) AS DATE) AS day
      |      FROM act, span),
      |wau AS (SELECT day, count(*) AS wau7 FROM contrib GROUP BY day),
      |dau AS (SELECT d AS day, count(*) AS dau FROM act GROUP BY d)
      |SELECT w.day, coalesce(dau.dau, 0) AS dau, w.wau7
      |FROM wau w LEFT JOIN dau ON w.day = dau.day
      |ORDER BY w.day""".stripMargin

  /** SCD Type-2 dimension build from an event stream: track each user's
    * `event_type` as a slowly-changing attribute — collapse consecutive
    * repeats, emit one row per version with [valid_from, valid_to) validity
    * and an is_current flag. The reference's incremental loads (S1/SNK1)
    * only ever append the latest state; SCD2 is the warehouse-standard
    * history-preserving variant. One window per step, both keyed on
    * user_id — at 100 TB a single hash shuffle, no self-joins, and the
    * change-filter drops the (dominant) unchanged rows before the second
    * window. Ties broken by event_id so versioning is engine-stable. */
  def q47(spark: SparkSession, dir: String) = {
    import spark.implicits._
    graft.operators.Scd.scd2Build(
        Tables.events(spark, dir).select($"user_id", $"ts", $"event_id", $"event_type"))
      .orderBy("user_id", "version")
  }

  private val q47Oracle =
    """WITH s AS (SELECT user_id, ts, event_id, event_type,
      |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |      FROM events),
      |c AS (SELECT user_id, ts, event_id, event_type FROM s
      |      WHERE prev IS NULL OR prev <> event_type),
      |f AS (SELECT user_id, event_type, ts AS valid_from,
      |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      |      FROM c)
      |SELECT user_id, version, event_type, valid_from, valid_to,
      |       (valid_to IS NULL) AS is_current
      |FROM f ORDER BY user_id, version""".stripMargin

  /** q48: robust outlier detection per group — median + MAD (median
    * absolute deviation), flagging |x − med| > 3·1.4826·MAD (the normal-
    * consistent robust z-score). Both medians use q25's spill-safe
    * rank-join (row_number + positional pick + linear interpolation), NOT
    * a buffer-everything percentile. Cross-engine exactness: the oracle
    * replicates the SAME interpolation arithmetic (not quantile_cont), so
    * med/MAD are bit-identical doubles and the outlier comparison cannot
    * flip at a boundary; only the DISPLAYED med/mad are rounded. Scale:
    * two ranked passes + one gate pass, all shuffled on the group key;
    * WindowExec spills, no per-group buffering. */
  def q48(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderpriority".as("pr"), $"o_totalprice".as("v"))
    def medianOf(df: org.apache.spark.sql.DataFrame, valCol: String): org.apache.spark.sql.DataFrame = {
      val counts = df.groupBy($"pr").agg(count(lit(1)).as("n"))
      val pos = ($"n" - 1).cast("double") * 0.5
      df.withColumn("rn", row_number().over(Window.partitionBy($"pr").orderBy(col(valCol))))
        .join(broadcast(counts), "pr")
        .groupBy($"pr")
        .agg(
          max(when($"rn" === floor(pos) + 1, col(valCol))).as("lo"),
          max(when($"rn" === ceil(pos) + 1, col(valCol))).as("hi"),
          max(pos).as("p"), max($"n").as("n"))
        .select($"pr", $"n",
          when(floor($"p") === ceil($"p"), $"lo")
            .otherwise($"lo" * (ceil($"p") - $"p") + $"hi" * ($"p" - floor($"p")))
            .as("m"))
    }
    val med = medianOf(o, "v").select($"pr", $"n", $"m".as("med"))
    val ad = o.join(broadcast(med.select($"pr", $"med")), "pr")
      .select($"pr", abs($"v" - $"med").as("ad"))
    val mad = medianOf(ad, "ad").select($"pr", $"m".as("mad"))
    val gates = o.join(broadcast(med.select($"pr", $"med")), "pr")
      .join(broadcast(mad), "pr")
      .groupBy($"pr")
      .agg(sum(when(abs($"v" - $"med") > lit(3.0) * lit(1.4826) * $"mad", 1).otherwise(0))
        .as("n_outliers"))
    med.join(mad, "pr").join(gates, "pr")
      .select($"pr".as("o_orderpriority"), $"n",
        QueryUtil.halfUp($"med", 2).as("med2"),
        QueryUtil.halfUp($"mad", 2).as("mad2"),
        $"n_outliers")
      .orderBy("o_orderpriority")
  }

  private val q48Oracle = {
    def medSql(src: String, v: String, out: String): String =
      s"""${out}_c AS (SELECT pr, count(*) AS n FROM $src GROUP BY pr),
         |${out}_r AS (SELECT s.pr, s.$v AS v,
         |         row_number() OVER (PARTITION BY s.pr ORDER BY s.$v) AS rn, c.n
         |       FROM $src s JOIN ${out}_c c ON s.pr = c.pr),
         |${out}_m AS (SELECT pr, max(n) AS n,
         |         max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN v END) AS lo,
         |         max(CASE WHEN rn = CAST(ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN v END) AS hi,
         |         max(CAST(n - 1 AS DOUBLE) * 0.5) AS p
         |       FROM ${out}_r GROUP BY pr),
         |$out AS (SELECT pr, n,
         |         CASE WHEN floor(p) = ceil(p) THEN lo
         |              ELSE lo * (ceil(p) - p) + hi * (p - floor(p)) END AS m
         |       FROM ${out}_m)""".stripMargin
    s"""WITH o AS (SELECT o_orderpriority AS pr, o_totalprice AS v FROM orders),
       |${medSql("o", "v", "med")},
       |adt AS (SELECT o.pr, abs(o.v - med.m) AS ad FROM o JOIN med ON o.pr = med.pr),
       |${medSql("adt", "ad", "mad")},
       |g AS (SELECT o.pr,
       |        CAST(sum(CASE WHEN abs(o.v - med.m) > 3.0 * 1.4826 * mad.m THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |      FROM o JOIN med ON o.pr = med.pr JOIN mad ON o.pr = mad.pr
       |      GROUP BY o.pr)
       |SELECT med.pr AS o_orderpriority, med.n,
       |       floor(med.m * 100 + 0.5) / 100.0 AS med2,
       |       floor(mad.m * 100 + 0.5) / 100.0 AS mad2,
       |       g.n_outliers
       |FROM med JOIN mad ON med.pr = mad.pr JOIN g ON med.pr = g.pr
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** q49: marketing attribution (the reference's domain): each purchase
    * is attributed to the user's FIRST and LAST touch (click/view) in the
    * trailing 24 h, 'direct' when none — revenue summed per (model,
    * touch). One pass: touches are encoded as zero-padded
    * 'sec|event_id|type' strings so lexicographic min/max over a RANGE
    * frame IS chronological first/last (engine-stable, no struct-agg
    * support needed); both models come from the same two window
    * aggregates and explode into (model, touch) rows. Money sums follow
    * the exact-integer-cents recipe (quantize per row, order-free integer
    * sum). 100 TB: one user-keyed shuffle for the windows, then a tiny
    * aggregate; no self-join of events against events. */
  def q49(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val sec = unix_timestamp($"ts".cast("timestamp"))
    val touch = $"event_type".isin("click", "view")
    // 19-digit pads cover the full non-negative long domain — lpad
    // TRUNCATES values wider than the pad, which would corrupt the
    // lexicographic-chronological ordering identically in both engines
    // (invisible to the oracle) for >10-digit ids or post-2286 seconds.
    val enc = concat_ws("|", lpad(sec.cast("string"), 19, "0"),
      lpad($"event_id".cast("string"), 19, "0"), $"event_type")
    val w = Window.partitionBy($"user_id").orderBy(sec)
      .rangeBetween(-86400L, 0L)
    val scored = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .withColumn("lastt", max(when(touch, enc)).over(w))
      .withColumn("firstt", min(when(touch, enc)).over(w))
      .filter($"event_type" === "purchase")
      .select($"value",
        coalesce(element_at(split($"lastt", "\\|"), 3), lit("direct")).as("last"),
        coalesce(element_at(split($"firstt", "\\|"), 3), lit("direct")).as("first"))
    scored
      .select(floor($"value" * 100 + lit(0.5)).cast("long").as("cents"),
        explode(array(
          struct(lit("last").as("model"), $"last".as("touch")),
          struct(lit("first").as("model"), $"first".as("touch")))).as("m"))
      .select($"m.model".as("model"), $"m.touch".as("touch"), $"cents")
      .groupBy($"model", $"touch")
      .agg(count(lit(1)).as("n_purchases"),
        (sum($"cents").cast("double") / 100.0).as("revenue"))
      .orderBy("model", "touch")
  }

  private val q49Oracle =
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |             event_id, event_type, value FROM events),
      |sc AS (SELECT user_id, sec, event_id, event_type, value,
      |         max(CASE WHEN event_type IN ('click', 'view')
      |             THEN lpad(CAST(sec AS VARCHAR), 19, '0') || '|' || lpad(CAST(event_id AS VARCHAR), 19, '0') || '|' || event_type END)
      |           OVER (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS lastt,
      |         min(CASE WHEN event_type IN ('click', 'view')
      |             THEN lpad(CAST(sec AS VARCHAR), 19, '0') || '|' || lpad(CAST(event_id AS VARCHAR), 19, '0') || '|' || event_type END)
      |           OVER (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS firstt
      |       FROM e),
      |p AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |        coalesce(string_split(lastt, '|')[3], 'direct') AS last,
      |        coalesce(string_split(firstt, '|')[3], 'direct') AS first
      |      FROM sc WHERE event_type = 'purchase'),
      |x AS (SELECT 'last' AS model, last AS touch, cents FROM p
      |      UNION ALL SELECT 'first', first, cents FROM p)
      |SELECT model, touch, count(*) AS n_purchases,
      |       CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
      |FROM x GROUP BY model, touch
      |ORDER BY model, touch""".stripMargin

  /** q50: full CDC merge through [[graft.sinks.Sinks.applyCdc]], oracle-
    * paired: each user's FIRST event is the existing snapshot row, every
    * later event becomes a change op (error → DELETE, signup → INSERT,
    * anything else → UPDATE to that type) with event_id as the log
    * sequence — the latest op per user decides the final table, deletes
    * remove the row. This lifts the reference's append-only incremental
    * path (S1/SNK1) to insert/update/delete capture and grades the
    * operator against DuckDB instead of only its spec. */
  def q50(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val ranked = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("rn", row_number().over(w))
    val snapshot = ranked.filter($"rn" === 1)
      .select($"user_id".as("k"), $"event_type".as("v"))
    val batch = ranked.filter($"rn" > 1)
      .select($"user_id".as("k"), $"event_type".as("v"), $"event_id".as("seq"),
        when($"event_type" === "error", "D")
          .when($"event_type" === "signup", "I")
          .otherwise("U").as("op"))
    graft.sinks.Sinks.applyCdc(snapshot, batch, "k", "seq", "op")
      .orderBy("k")
  }

  private val q50Oracle =
    """WITH ranked AS (SELECT user_id, ts, event_id, event_type,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |      FROM events),
      |snap AS (SELECT user_id AS k, event_type AS v FROM ranked WHERE rn = 1),
      |batch AS (SELECT user_id AS k, event_type AS v, event_id AS seq,
      |        CASE WHEN event_type = 'error' THEN 'D'
      |             WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op
      |      FROM ranked WHERE rn > 1),
      |latest AS (SELECT k, v, op FROM (
      |        SELECT k, v, op, row_number() OVER (PARTITION BY k ORDER BY seq DESC, op ASC) AS lrn
      |        FROM batch)
      |      WHERE lrn = 1)
      |SELECT k, v FROM snap WHERE k NOT IN (SELECT k FROM latest)
      |UNION ALL
      |SELECT k, v FROM latest WHERE op <> 'D'
      |ORDER BY k""".stripMargin

  /** q51: incremental view maintenance for partitioned aggregates — the
    * pattern that makes 100 TB dashboards affordable: the historical state
    * (events before the cutoff) is aggregated ONCE and kept; each new batch
    * aggregates alone and MERGES into the state by a full-outer key join
    * (counts/sums add, min/max fold, avg re-derives from the merged sum —
    * never stored). The oracle aggregates the whole table in one pass, so
    * a hash match proves the merge is lossless: maintain ≡ recompute.
    * All merge arithmetic is integer (counts + half-up cents per row
    * BEFORE summing, q42's trick), so the proof can't drift an ulp.
    * least/greatest skip NULLs identically in both engines (keys absent
    * from one side fold correctly). Scale: the state never rescans; each
    * batch costs one batch-sized aggregation + a state-key join. */
  def q51(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    def agg(df: DataFrame) = df
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor($"value" * 100 + lit(0.5)).cast("long")).as("sum_cents"),
        min($"ts").as("first_ts"), max($"ts").as("last_ts"))
    val ev = Tables.events(spark, dir)
    graft.sinks.Sinks.mergeAggState(
        agg(ev.filter($"ts" < cutoff)), agg(ev.filter($"ts" >= cutoff)),
        Seq("event_type", "day"))
      .withColumn("avg_value",
        QueryUtil.halfUp($"sum_cents".cast("double") / 100.0 / $"cnt".cast("double"), 2))
      .orderBy($"event_type", $"day")
  }

  private val q51Oracle =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       min(ts) AS first_ts, max(ts) AS last_ts,
      |       floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |             / 100.0 / count(*) * 100 + 0.5) / 100.0 AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, day""".stripMargin

  /** x67: exponentially time-decayed activity counts — the freshness
    * weighting a training-data sampler or trending-topics ranker applies:
    * score(type, D) = Σ_{d ∈ (D−30, D]} cnt_d · 2^(d−D), half-life one
    * day. Weights are powers of two, so the fixed-point form
    * Σ cnt_d · 2^(30−(D−d)) is an EXACT integer (order-free, no float
    * accumulation) with `decayed = decayed_fp / 2^30`. Scale (100 TB):
    * the only corpus-sized stage is the per-(type, day) count; the decay
    * is a trailing-window join on the days×types panel, which is tiny at
    * any scale (the join is banded by the 30-day bound, not all-pairs). */
  def x67(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val dc = Tables.events(spark, dir)
      .groupBy($"event_type", datediff(to_date($"ts"), lit("2024-01-01")).as("dayn"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // both sides of the trailing-window join
    val cur = dc.select($"event_type", $"dayn")
    val past = dc.select($"event_type".as("p_type"), $"dayn".as("p_dayn"), $"cnt")
    cur.join(past, $"event_type" === $"p_type" &&
        $"p_dayn" <= $"dayn" && $"p_dayn" > $"dayn" - 30)
      .groupBy($"event_type", $"dayn")
      .agg(sum(expr("cnt * shiftleft(CAST(1 AS BIGINT), CAST(30 - (dayn - p_dayn) AS INT))"))
        .as("decayed_fp"))
      .select($"event_type", $"dayn",
        $"decayed_fp", ($"decayed_fp" / lit(1073741824.0)).as("decayed"))
      .orderBy($"event_type", $"dayn")
  }

  private val x67Oracle =
    """WITH dc AS MATERIALIZED (
      |  SELECT event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dayn,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT c.event_type, c.dayn,
      |       CAST(sum(p.cnt * (CAST(1 AS BIGINT) << (30 - (c.dayn - p.dayn)))) AS BIGINT) AS decayed_fp,
      |       CAST(sum(p.cnt * (CAST(1 AS BIGINT) << (30 - (c.dayn - p.dayn)))) AS BIGINT) / 1073741824.0 AS decayed
      |FROM dc c JOIN dc p
      |  ON c.event_type = p.event_type AND p.dayn <= c.dayn AND p.dayn > c.dayn - 30
      |GROUP BY 1, 2
      |ORDER BY c.event_type, c.dayn""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x67_decayed_counts",
      "exponentially time-decayed activity counts (half-life 1 day) in exact power-of-two fixed point",
      x67, Some(x67Oracle)),
    QueryDef("q51_ivm_agg",
      "incremental aggregate maintenance: state+batch full-outer merge proven lossless vs one-pass recompute",
      q51, Some(q51Oracle)),
    QueryDef("q50_cdc_merge", "insert/update/delete CDC merge (Sinks.applyCdc) vs latest-op oracle", q50, Some(q50Oracle)),
    QueryDef("q49_attribution", "first/last-touch revenue attribution, 24h lookback, one windowed pass", q49, Some(q49Oracle)),
    QueryDef("q48_mad_outliers", "robust per-group outlier gate: rank-join median + MAD, bit-identical interpolation", q48, Some(q48Oracle)),
    QueryDef("q47_scd2", "SCD Type-2 dimension build: per-user attribute versions with validity intervals", q47, Some(q47Oracle)),
    QueryDef("q46_rolling_distinct", "exact 7-day rolling distinct actives via bounded window-day explode", q46, Some(q46Oracle)),
    QueryDef("q44_funnel", "ordered funnel stage counts, 24h conversion window", q44, Some(q44Oracle)),
    QueryDef("q45_cohort_retention", "first-active-day cohorts x week-offset retention", q45, Some(q45Oracle)),
    QueryDef("q43_time_bars", "hourly time-bucket resampling with OHLC-style bars", q43, Some(q43Oracle)),
    QueryDef("q42_outer_joins", "FULL OUTER join with null-completion over asymmetric keys", q42, Some(q42Oracle)),
    QueryDef("q33_window_range_frame", "RANGE frame (30d trailing), lead, nth_value", q33, Some(q33Oracle)),
    QueryDef("q41_hof_arrays", "higher-order array functions (exists/forall/filter/aggregate/zip_with)", q41, Some(q41Oracle)),
    QueryDef("q39_exists_correlated", "correlated EXISTS decorrelated to semi-join", q39, Some(q39Oracle)),
    QueryDef("q40_scalar_correlated", "correlated scalar subquery (per-row count)", q40, Some(q40Oracle)),
    QueryDef("q34_bag_setops", "EXCEPT ALL / INTERSECT ALL multiplicity semantics", q34, Some(q34Oracle)),
    QueryDef("q35_na_handling", "na.fill / na.drop null-handling surface", q35, Some(q35Oracle)),
    QueryDef("q36_hash_sample", "deterministic hash-Bernoulli sampling", q36, Some(q36Oracle)),
    QueryDef("x48_edit_distance", "Levenshtein over near-dup candidate prefixes", x48, Some(x48Oracle)),
    QueryDef("q37_pivot", "native DataFrame pivot with fixed value columns", q37, Some(q37Oracle)),
    QueryDef("q38_unpivot", "native unpivot/melt wide-to-long", q38, Some(q38Oracle)))
}
