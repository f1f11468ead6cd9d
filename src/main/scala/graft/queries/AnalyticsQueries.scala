package graft.queries

import graft.{QueryDef, Tables}
import graft.queries.QueryUtil.{halfUp, halfUp4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence- and market-analytics tier — the classic mining operators a
  * warehouse team runs beside the ETL: association rules over order
  * baskets, Markov transition matrices over event streams, and market
  * concentration (HHI) reports. All ratios follow the exact-integer-
  * numerator recipe: counts and cents stay integral until one final
  * double division that both engines perform on bit-identical inputs. */
object AnalyticsQueries {

  /** Pair support threshold: keep brand pairs co-occurring in >= 1% of
    * baskets (`pc * 100 >= n` — integer predicate, no float epsilon). */
  private val SupPct = 1

  /** q56: association rules — market-basket mining on order baskets with
    * items = part brands (25-value domain). For every ordered brand pair
    * (a < b) above [[SupPct]]% support: support, confidence(a→b), and
    * lift, all as exact integer ratios divided once at the end.
    * Scale: the pair generator is a SELF-JOIN ON THE BASKET KEY — cost is
    * sum over baskets of C(k,2) with k = distinct items per basket
    * (bounded by the 25-brand domain), never |items|². The brand-count
    * side is a 25-row broadcast. Lift numerator `pc * n` stays in int64
    * through ~SF100 (pc, n < 3e9). */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
      .join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("o"), $"p_brand".as("b")).distinct()
    val nDf = items.agg(count_distinct($"o").as("n")) // scalar, broadcast below
    val counts = items.groupBy($"b").agg(count(lit(1)).as("cb")) // 25 rows
    val pairs = items.as("x").join(items.as("y"), $"x.o" === $"y.o")
      .filter($"x.b" < $"y.b")
      .groupBy($"x.b".as("brand_a"), $"y.b".as("brand_b"))
      .agg(count(lit(1)).as("n_pair"))
    pairs.crossJoin(broadcast(nDf))
      .filter($"n_pair" * 100 >= $"n" * SupPct)
      .join(broadcast(counts.withColumnRenamed("b", "brand_a")
        .withColumnRenamed("cb", "ca")), Seq("brand_a"))
      .join(broadcast(counts.withColumnRenamed("b", "brand_b")), Seq("brand_b"))
      .select($"brand_a", $"brand_b", $"n_pair",
        halfUp4($"n_pair".cast("double") / $"n".cast("double")).as("support"),
        halfUp4($"n_pair".cast("double") / $"ca".cast("double")).as("confidence"),
        halfUp4(($"n_pair" * $"n").cast("double") / ($"ca" * $"cb").cast("double"))
          .as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  private val associationRulesOracle =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
       |               FROM lineitem JOIN part ON l_partkey = p_partkey),
       |n AS (SELECT count(DISTINCT o) AS n FROM items),
       |cnt AS (SELECT b, count(*) AS cb FROM items GROUP BY b),
       |pairs AS (SELECT x.b AS brand_a, y.b AS brand_b, count(*) AS n_pair
       |          FROM items x JOIN items y ON x.o = y.o AND x.b < y.b
       |          GROUP BY x.b, y.b)
       |SELECT brand_a, brand_b, n_pair,
       |       floor((CAST(n_pair AS DOUBLE) / CAST(n.n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS support,
       |       floor((CAST(n_pair AS DOUBLE) / CAST(ca.cb AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS confidence,
       |       floor((CAST(n_pair * n.n AS DOUBLE) / CAST(ca.cb * cb.cb AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS lift
       |FROM pairs, n
       |JOIN cnt ca ON ca.b = brand_a
       |JOIN cnt cb ON cb.b = brand_b
       |WHERE n_pair * 100 >= n.n * $SupPct
       |ORDER BY brand_a, brand_b""".stripMargin

  /** q57: Markov transition matrix — per-user event streams ordered by
    * (ts, event_id), lag(1) pairs (prev → next) counted globally, row-
    * normalized into transition probabilities (5×5 event-type domain).
    * The per-prev total is a window sum over the 25-row transition frame,
    * not the event stream. Scale: one keyed window (the same
    * user-partitioned sort q22/q44 already run) + one tiny aggregate;
    * the normalization never touches the big table. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val t = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    t.withColumn("tot", sum($"n_trans").over(Window.partitionBy($"prev_type")))
      .select($"prev_type", $"next_type", $"n_trans",
        halfUp4($"n_trans".cast("double") / $"tot".cast("double")).as("p_trans"))
      .orderBy("prev_type", "next_type")
  }

  private val markovTransitionsOracle =
    """WITH s AS (SELECT event_type,
      |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |           FROM events),
      |t AS (SELECT prev_type, event_type AS next_type, count(*) AS n_trans
      |      FROM s WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type)
      |SELECT prev_type, next_type, n_trans,
      |       floor((CAST(n_trans AS DOUBLE)
      |              / CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS p_trans
      |FROM t
      |ORDER BY prev_type, next_type""".stripMargin

  /** q58: market concentration — per nation, the Herfindahl–Hirschman
    * index of customer revenue shares plus the top-customer share. The
    * HHI numerator Σc² is summed EXACTLY (decimal(38,0) in Spark, HUGEINT
    * in the oracle — int64 would overflow past ~SF0.1) and converted to
    * double once; shares divide bit-identical integers, so no
    * order-dependent float summation anywhere. Scale: one groupBy per
    * customer, one per nation; the nation frame is 25 rows. */
  def concentrationHhi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("c"))
    val perNation = cents
      .join(Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum($"c").as("t"),
        sum($"c".cast("decimal(38,0)") * $"c".cast("decimal(38,0)")).as("ssq"),
        max($"c").as("mx"))
    perNation.select($"n_name", $"n_cust",
      ($"t".cast("double") / 100.0).as("revenue"),
      halfUp($"ssq".cast("double") / ($"t".cast("double") * $"t".cast("double")), 6)
        .as("hhi"),
      halfUp($"mx".cast("double") / $"t".cast("double"), 6).as("top_share"))
      .orderBy("n_name")
  }

  private val concentrationHhiOracle =
    """WITH cents AS (SELECT o_custkey, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
      |               FROM orders GROUP BY o_custkey),
      |per AS (SELECT n_name, count(*) AS n_cust, sum(c) AS t,
      |          sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ssq, max(c) AS mx
      |        FROM cents
      |        JOIN customer ON o_custkey = c_custkey
      |        JOIN nation ON c_nationkey = n_nationkey
      |        GROUP BY n_name)
      |SELECT n_name, n_cust,
      |       CAST(t AS DOUBLE) / 100.0 AS revenue,
      |       floor((CAST(ssq AS DOUBLE) / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS hhi,
      |       floor((CAST(mx AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS top_share
      |FROM per
      |ORDER BY n_name""".stripMargin

  /** q59: seasonal anomaly detection — per hour-of-week bucket (168
    * rows), a mean/std baseline of event values and the count of events
    * beyond 2σ. Values are half-up-quantized to integer hundredths FIRST,
    * so every moment (Σq, Σq²) is an exact integer sum (order-free across
    * partitions; Σq² in decimal/HUGEINT) and mean/var/σ/z are derived by
    * the IDENTICAL IEEE op sequence in both engines — the |z| > 2 cut is
    * then engine-stable with no float-summation drift channel. Scale: one
    * 168-group aggregate + one broadcast join of the baseline back onto
    * the stream; nothing else touches the big table. */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(((dayofweek($"ts") - 1) * 24 + hour($"ts")).cast("long").as("how"),
        floor($"value" * 100 + 0.5).cast("long").as("q"))
    val base = ev.groupBy($"how")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"),
        sum($"q".cast("decimal(38,0)") * $"q".cast("decimal(38,0)")).as("ssq"))
      .withColumn("mean", $"s".cast("double") / $"n".cast("double"))
      .withColumn("variance",
        greatest($"ssq".cast("double") / $"n".cast("double") - $"mean" * $"mean",
          lit(0.0)))
      .withColumn("std", sqrt($"variance"))
    ev.join(broadcast(base), Seq("how"))
      .groupBy($"how")
      .agg(count(lit(1)).as("n_events"),
        halfUp4(first($"mean") / 100.0).as("mean_v"),
        sum(($"std" > 0 &&
          abs(($"q".cast("double") - $"mean") / $"std") > 2.0).cast("long"))
          .as("n_anom"))
      .orderBy("how")
  }

  private val seasonalAnomalyOracle =
    """WITH ev AS (SELECT CAST(dayofweek(ts) * 24 + hour(ts) AS BIGINT) AS how,
      |              CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
      |            FROM events),
      |base AS (SELECT how, count(*) AS n, sum(q) AS s,
      |           sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS ssq
      |         FROM ev GROUP BY how),
      |stats AS (SELECT how, n, s, ssq,
      |            CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |            greatest(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE)
      |                     - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0) AS variance
      |          FROM base)
      |SELECT ev.how, count(*) AS n_events,
      |       floor((mean / 100.0) * 10000 + 0.5) / 10000.0 AS mean_v,
      |       CAST(sum(CASE WHEN sqrt(variance) > 0
      |                      AND abs((CAST(q AS DOUBLE) - mean) / sqrt(variance)) > 2.0
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
      |FROM ev JOIN stats ON ev.how = stats.how
      |GROUP BY ev.how, mean, variance
      |ORDER BY ev.how""".stripMargin

  /** q60: CUSUM changepoint detection — daily revenue cents c_i, with the
    * cumulative deviation kept EXACT by working in N-scaled integer units:
    * S_k = Σ_{i≤k} (c_i·N − T) (N = #days, T = total cents) is a
    * decimal/HUGEINT cumulative window sum, so the argmax |S_k| — the
    * classic CUSUM changepoint — involves no float at all; S_k is
    * converted to currency units (÷ N·100) only for display. Scale: the
    * daily aggregate shuffles once; the cumulative window and the global
    * max run on the DAYS-sized frame (~2.4k rows), not the orders table. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM-dd").as("day"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("c"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum($"c").as("t"))
    val wCum = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cu = daily.crossJoin(broadcast(tot))
      .withColumn("sk",
        sum($"c".cast("decimal(38,0)") * $"nd" - $"t").over(wCum))
    cu.withColumn("mx", max(abs($"sk")).over(Window.partitionBy()))
      .select($"day", ($"c".cast("double") / 100.0).as("revenue"),
        halfUp4($"sk".cast("double") / ($"nd".cast("double") * 100.0)).as("cusum"),
        (abs($"sk") === $"mx").as("is_peak"))
      .orderBy("day")
  }

  private val cusumChangepointOracle =
    """WITH daily AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
      |                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
      |               FROM orders GROUP BY 1),
      |tot AS (SELECT count(*) AS nd, sum(c) AS t FROM daily),
      |cu AS (SELECT day, c, nd,
      |         sum(CAST(c AS HUGEINT) * nd - t)
      |           OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sk
      |       FROM daily, tot)
      |SELECT day, CAST(c AS DOUBLE) / 100.0 AS revenue,
      |       floor((CAST(sk AS DOUBLE) / (CAST(nd AS DOUBLE) * 100.0)) * 10000 + 0.5) / 10000.0 AS cusum,
      |       abs(sk) = max(abs(sk)) OVER () AS is_peak
      |FROM cu
      |ORDER BY day""".stripMargin

  /** q61: data-quality report — the referential-integrity / key-duplication
    * / null-rate sweep every ingestion runs before publishing a snapshot,
    * as ONE unioned report: orphan FKs at each edge of the schema
    * (anti-join counts), duplicate primary keys, and null counts on
    * NOT-NULL-expected columns. All integer counts; the rate divides two
    * exact integers once. Scale: each check is one anti-join or aggregate
    * with the dimension side broadcast where it fits (nation); fact-to-fact
    * checks shuffle on the FK — the join key they would shuffle on anyway. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    def row(name: String, bad: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
      bad.agg(count(lit(1)).as("n_bad")).crossJoin(
        broadcast(total.agg(count(lit(1)).as("n_total"))))
        .select(lit(name).as("check_name"), $"n_bad", $"n_total",
          halfUp4($"n_bad".cast("double") / $"n_total".cast("double")).as("bad_rate"))
    val orphanLi = li.join(o.select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_anti")
    val orphanO = o.join(c.select($"c_custkey"),
      $"o_custkey" === $"c_custkey", "left_anti")
    val orphanC = c.join(broadcast(Tables.nation(spark, dir).select($"n_nationkey")),
      $"c_nationkey" === $"n_nationkey", "left_anti")
    val dupO = o.groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
    val nullDate = o.filter($"o_orderdate".isNull)
    row("fk_lineitem_orders", orphanLi, li)
      .unionByName(row("fk_orders_customer", orphanO, o))
      .unionByName(row("fk_customer_nation", orphanC, c))
      .unionByName(row("pk_orders_dup", dupO, o))
      .unionByName(row("null_orderdate", nullDate, o))
      .orderBy("check_name")
  }

  private val dqReportOracle =
    """SELECT check_name, CAST(n_bad AS BIGINT) AS n_bad,
      |       CAST(n_total AS BIGINT) AS n_total,
      |       floor((CAST(n_bad AS DOUBLE) / CAST(n_total AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS bad_rate
      |FROM (
      |  SELECT 'fk_lineitem_orders' AS check_name,
      |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
      |         (SELECT count(*) FROM lineitem) AS n_total
      |  UNION ALL
      |  SELECT 'fk_orders_customer',
      |         (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |         (SELECT count(*) FROM orders)
      |  UNION ALL
      |  SELECT 'fk_customer_nation',
      |         (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
      |         (SELECT count(*) FROM customer)
      |  UNION ALL
      |  SELECT 'pk_orders_dup',
      |         (SELECT count(*) FROM (SELECT o_orderkey FROM orders
      |                                GROUP BY o_orderkey HAVING count(*) > 1)),
      |         (SELECT count(*) FROM orders)
      |  UNION ALL
      |  SELECT 'null_orderdate',
      |         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
      |         (SELECT count(*) FROM orders))
      |ORDER BY check_name""".stripMargin

  /** q62: RFM segmentation — per customer recency (days since last order
    * vs the corpus max date), frequency (order count), monetary (exact
    * cents), each quartiled by ntile(4) with custkey tie-breaks (fully
    * deterministic), rolled up to segment cells. Scale note (stated, not
    * hidden): ntile over an unpartitioned window is a single-partition
    * sort of the CUSTOMER aggregate (not the fact table) — the standard
    * RFM definition; at 100 TB you'd swap quartiles for approx-percentile
    * cutpoints broadcast back, same output contract. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val refDate = Tables.orders(spark, dir).agg(max($"o_orderdate").as("ref"))
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_o"), count(lit(1)).as("f"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("m"))
      .crossJoin(broadcast(refDate))
      .select($"o_custkey", datediff($"ref", $"last_o").cast("long").as("r_days"),
        $"f", $"m")
    val rb = ntile(4).over(Window.orderBy($"r_days".asc, $"o_custkey"))
    val fb = ntile(4).over(Window.orderBy($"f".desc, $"o_custkey"))
    val mb = ntile(4).over(Window.orderBy($"m".desc, $"o_custkey"))
    per.select($"o_custkey", rb.as("r_bucket"), fb.as("f_bucket"), mb.as("m_bucket"), $"f", $"m")
      .groupBy($"r_bucket", $"f_bucket", $"m_bucket")
      .agg(count(lit(1)).as("n_cust"),
        (sum($"m").cast("double") / 100.0).as("revenue"),
        halfUp4(sum($"f").cast("double") / count(lit(1)).cast("double")).as("avg_orders"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  private val rfmSegmentsOracle =
    """WITH per AS (SELECT o_custkey,
      |               date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders)) AS r_days,
      |               count(*) AS f,
      |               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m
      |             FROM orders GROUP BY o_custkey),
      |b AS (SELECT o_custkey, f, m,
      |        ntile(4) OVER (ORDER BY r_days ASC, o_custkey) AS r_bucket,
      |        ntile(4) OVER (ORDER BY f DESC, o_custkey) AS f_bucket,
      |        ntile(4) OVER (ORDER BY m DESC, o_custkey) AS m_bucket
      |      FROM per)
      |SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_cust,
      |       CAST(sum(m) AS DOUBLE) / 100.0 AS revenue,
      |       floor((CAST(sum(f) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS avg_orders
      |FROM b
      |GROUP BY r_bucket, f_bucket, m_bucket
      |ORDER BY r_bucket, f_bucket, m_bucket""".stripMargin

  /** q63: Pareto / concentration deciles — customers ranked by exact-cents
    * revenue into ntile(10) deciles; per decile the revenue share and the
    * running cumulative share (the 80/20 curve). Shares divide exact
    * integer cent sums; the cumulative sum runs over the TEN-row decile
    * frame. Same unpartitioned-ntile scale note as q62. */
  def paretoDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("m"))
    val dec = per
      .select($"o_custkey", $"m",
        ntile(10).over(Window.orderBy($"m".desc, $"o_custkey")).as("decile"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_cust"), sum($"m").as("dm"))
    val wCum = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.crossJoin(broadcast(dec.agg(sum($"dm").as("tm"))))
      .withColumn("cum_dm", sum($"dm").over(wCum))
      .select($"decile", $"n_cust",
        ($"dm".cast("double") / 100.0).as("revenue"),
        halfUp4($"dm".cast("double") / $"tm".cast("double")).as("share"),
        halfUp4($"cum_dm".cast("double") / $"tm".cast("double")).as("cum_share"))
      .orderBy("decile")
  }

  private val paretoDecilesOracle =
    """WITH per AS (SELECT o_custkey, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m
      |             FROM orders GROUP BY o_custkey),
      |dec AS (SELECT decile, count(*) AS n_cust, sum(m) AS dm FROM (
      |          SELECT o_custkey, m, ntile(10) OVER (ORDER BY m DESC, o_custkey) AS decile
      |          FROM per)
      |        GROUP BY decile),
      |tot AS (SELECT sum(dm) AS tm FROM dec)
      |SELECT decile, n_cust,
      |       CAST(dm AS DOUBLE) / 100.0 AS revenue,
      |       floor((CAST(dm AS DOUBLE) / CAST(tm AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS share,
      |       floor((CAST(sum(dm) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      |              / CAST(tm AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS cum_share
      |FROM dec, tot
      |ORDER BY decile""".stripMargin

  /** Benford expectations log10(1 + 1/d) for d = 1..9 as LITERALS (the x87
    * discount-table trick: Scala Double.toString round-trips and DuckDB
    * parses the same decimal to the same double — zero libm in either
    * engine). */
  private val Benford: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** q64: Benford first-digit audit — the classic numeric-forgery /
    * data-corruption screen: the leading digit distribution of order
    * amounts (exact cents) vs Benford's law, with per-digit chi-square
    * contributions. Counts are exact integers; each χ² term
    * (n_d − p_d·n)²/(p_d·n) is computed by the identical IEEE op sequence
    * in both engines from (exact count, literal, exact total), quantized
    * half-up to 1e-6, and the running total is an integer window sum over
    * the NINE-row digit frame. Scale: one 9-group aggregate over the
    * scan; everything after is constant-sized. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expCol = Benford.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (p, i)) =>
      when($"digit" === (i + 1), lit(p)).otherwise(acc)
    }
    // Domain guard: Benford is defined for POSITIVE magnitudes only — a
    // zero/negative total would put digit outside 1..9 (exp_rate 0 → a
    // divide-by-zero the engines disagree on: Spark floors Infinity to
    // Long.MaxValue, DuckDB errors). The fixture has none; the guard makes
    // the operator total-function on any input.
    val byDigit = Tables.orders(spark, dir)
      .select(substring(floor($"o_totalprice" * 100 + 0.5).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .filter($"digit".between(1, 9))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val tot = byDigit.agg(sum($"n_obs").as("n"))
    val term = ($"n_obs".cast("double") - $"exp_rate" * $"n".cast("double")) *
      ($"n_obs".cast("double") - $"exp_rate" * $"n".cast("double")) /
      ($"exp_rate" * $"n".cast("double"))
    val wCum = Window.orderBy($"digit")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDigit.crossJoin(broadcast(tot))
      .withColumn("exp_rate", expCol)
      .withColumn("chi_fp", floor(term * lit(1e6) + lit(0.5)).cast("long"))
      .select($"digit", $"n_obs",
        halfUp4($"n_obs".cast("double") / $"n".cast("double")).as("obs_rate"),
        $"exp_rate",
        halfUp4($"chi_fp".cast("double") / 1e6).as("chi_term"),
        halfUp4(sum($"chi_fp").over(wCum).cast("double") / 1e6).as("chi_cum"))
      .orderBy("digit")
  }

  private val benfordAuditOracle = {
    val expCase = "CASE digit " + Benford.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ") + " ELSE 0.0 END"
    s"""WITH byd AS (SELECT digit, count(*) AS n_obs FROM (
       |               SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |               FROM orders WHERE floor(o_totalprice * 100 + 0.5) >= 1)
       |             WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
       |tot AS (SELECT sum(n_obs) AS n FROM byd),
       |t AS (SELECT digit, n_obs, n, ($expCase) AS exp_rate FROM byd, tot),
       |c AS (SELECT digit, n_obs, n, exp_rate,
       |        CAST(floor(((CAST(n_obs AS DOUBLE) - exp_rate * CAST(n AS DOUBLE))
       |                    * (CAST(n_obs AS DOUBLE) - exp_rate * CAST(n AS DOUBLE))
       |                    / (exp_rate * CAST(n AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS chi_fp
       |      FROM t)
       |SELECT digit, n_obs,
       |       floor((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS obs_rate,
       |       exp_rate,
       |       floor((CAST(chi_fp AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000.0 AS chi_term,
       |       floor((CAST(sum(chi_fp) OVER (ORDER BY digit ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000.0 AS chi_cum
       |FROM c
       |ORDER BY digit""".stripMargin
  }

  /** k-anonymity threshold for q65 (groups smaller than K are suppression
    * candidates). */
  private val AnonK = 5

  /** q65: k-anonymity screening — the privacy-governance pass before a
    * dataset release: group sizes over the quasi-identifier tuple
    * (nation, market segment), every group flagged anonymous iff its
    * population ≥ [[AnonK]] (integer predicate), plus each group's share
    * of total suppression exposure. The release decision a real pipeline
    * makes from this: suppress or generalize the flagged rows. Scale: one
    * aggregate over the quasi-id key; the flag/share math runs on the
    * |nations|×|segments| frame. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
    g.crossJoin(broadcast(
      g.agg(sum(when($"n" < AnonK, $"n").otherwise(0L)).as("n_supp"))))
      .select($"n_name", $"c_mktsegment", $"n",
        ($"n" >= AnonK).as("anonymous"),
        when($"n_supp" > 0 && $"n" < AnonK,
          halfUp4($"n".cast("double") / $"n_supp".cast("double")))
          .otherwise(lit(0.0)).as("supp_share"))
      .orderBy("n_name", "c_mktsegment")
  }

  private val kAnonymityOracle =
    s"""WITH g AS (SELECT n_name, c_mktsegment, count(*) AS n
       |           FROM customer JOIN nation ON c_nationkey = n_nationkey
       |           GROUP BY n_name, c_mktsegment),
       |s AS (SELECT sum(CASE WHEN n < $AnonK THEN n ELSE 0 END) AS n_supp FROM g)
       |SELECT n_name, c_mktsegment, n,
       |       n >= $AnonK AS anonymous,
       |       CASE WHEN n_supp > 0 AND n < $AnonK
       |            THEN floor((CAST(n AS DOUBLE) / CAST(n_supp AS DOUBLE)) * 10000 + 0.5) / 10000.0
       |            ELSE 0.0 END AS supp_share
       |FROM g, s
       |ORDER BY n_name, c_mktsegment""".stripMargin

  /** q66: frequent event-sequence mining — the top-20 consecutive
    * 3-event-type patterns across per-user journeys (ordered by ts,
    * event_id — the q57 ordering, two lags deeper), the exploratory pass
    * that surfaces funnel hypotheses before a q44-style directed funnel is
    * written. Counts are exact; ranking ties break lexicographically.
    * Scale: ONE user-keyed window sort (the lag pair shares a single sort
    * spec), a 125-row-max pattern aggregate, and a global top-k on that
    * tiny frame. */
  def eventTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e1", lag($"event_type", 2).over(w))
      .withColumn("e2", lag($"event_type", 1).over(w))
      .filter($"e1".isNotNull && $"e2".isNotNull)
      .groupBy($"e1", $"e2", $"event_type".as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"e1", $"e2", $"e3")
      .limit(20)
  }

  private val eventTrigramsOracle =
    """WITH s AS (SELECT event_type,
      |             lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
      |             lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
      |           FROM events)
      |SELECT e1, e2, event_type AS e3, count(*) AS n
      |FROM s WHERE e1 IS NOT NULL AND e2 IS NOT NULL
      |GROUP BY e1, e2, event_type
      |ORDER BY n DESC, e1, e2, e3
      |LIMIT 20""".stripMargin

  /** q68: weighted median — the robust-statistics operator a plain
    * percentile can't express: per return flag, the lineitem price at
    * which HALF the total QUANTITY sits below. Lower weighted median:
    * first row (price asc, tie orderkey/linenumber) whose inclusive
    * cumulative quantity doubled reaches the total — `2·cum ≥ tot`, all
    * exact integers (quantities are whole in the fixture; cents for the
    * price). Scale: one window sort per group (the q08 frame) + a
    * min-over-candidates aggregate; no global sort. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"),
        floor($"l_quantity" + 0.5).cast("long").as("qty"),
        $"l_orderkey", $"l_linenumber")
    val wCum = Window.partitionBy($"l_returnflag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"l_returnflag")
    li.withColumn("cum", sum($"qty").over(wCum))
      .withColumn("tot", sum($"qty").over(wTot))
      .filter($"cum" * 2 >= $"tot")
      .groupBy($"l_returnflag")
      .agg(min($"cents").as("med_cents"), min($"tot").as("tot"))
      .select($"l_returnflag", ($"med_cents".cast("double") / 100.0).as("w_median"),
        $"tot".as("total_qty"))
      .orderBy("l_returnflag")
  }

  private val weightedMedianOracle =
    """WITH li AS (SELECT l_returnflag,
      |              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |              CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
      |              l_orderkey, l_linenumber
      |            FROM lineitem),
      |c AS (SELECT l_returnflag, cents,
      |        sum(qty) OVER (PARTITION BY l_returnflag
      |                       ORDER BY cents, l_orderkey, l_linenumber
      |                       ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(qty) OVER (PARTITION BY l_returnflag) AS tot
      |      FROM li)
      |SELECT l_returnflag,
      |       CAST(min(cents) AS DOUBLE) / 100.0 AS w_median,
      |       CAST(min(tot) AS BIGINT) AS total_qty
      |FROM c WHERE cum * 2 >= tot
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Histogram bin count for q69. */
  private val HistBins = 10L

  /** q69: equi-width histogram — the profiling companion to q53: order
    * totals in exact cents binned into [[HistBins]] equal-width buckets
    * over the observed [min, max], all in integer arithmetic
    * (`(c−mn)·B div (mx−mn+1)` — `div`, never float), with each bin's
    * exact share. The empty-bin case is preserved by joining a bin spine,
    * so the histogram shape is complete. Scale: one aggregate for the
    * bounds (broadcast scalar), one stateless binning pass, one B-group
    * aggregate. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select(floor($"o_totalprice" * 100 + 0.5).cast("long").as("c"))
    val bounds = cents.agg(min($"c").as("mn"), max($"c").as("mx"),
      count(lit(1)).as("n"))
    val binned = cents.crossJoin(broadcast(bounds))
      .select(expr(s"((c - mn) * $HistBins) div (mx - mn + 1)").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n_bin"))
    spark.range(HistBins).select($"id".as("bin"))
      .join(binned, Seq("bin"), "left")
      .crossJoin(broadcast(bounds.select($"n".as("n_all"))))
      .select($"bin", coalesce($"n_bin", lit(0L)).as("n_bin"),
        halfUp4(coalesce($"n_bin", lit(0L)).cast("double") / $"n_all".cast("double"))
          .as("share"))
      .orderBy("bin")
  }

  private val histogramOracle =
    s"""WITH cents AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
       |b AS (SELECT min(c) AS mn, max(c) AS mx, count(*) AS n FROM cents),
       |binned AS (SELECT ((c - mn) * $HistBins) // (mx - mn + 1) AS bin, count(*) AS n_bin
       |           FROM cents, b GROUP BY 1),
       |spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range($HistBins))
       |SELECT spine.bin, coalesce(n_bin, 0) AS n_bin,
       |       floor((CAST(coalesce(n_bin, 0) AS DOUBLE) / CAST(b.n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS share
       |FROM spine LEFT JOIN binned USING (bin), b
       |ORDER BY spine.bin""".stripMargin

  /** q70: grouped OLS trend lines — per order priority, the least-squares
    * slope/intercept of order value (exact cents) against order date (days
    * since 1995-01-01), from EXACT moments: Σx, Σy as int64, Σxy, Σx² as
    * decimal/HUGEINT, so the slope's numerator n·Σxy − Σx·Σy and
    * denominator n·Σx² − (Σx)² are exact integers converted to double once
    * — the q58/q59 moment recipe extended to covariance. The slope is
    * cents/day; intercept in cents at x = 0. Scale: one 5-group aggregate
    * over the scan; regression math on the 5-row frame. */
  def groupRegression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir).select($"o_orderpriority",
      datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("x"),
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("y"))
    val dec = "decimal(38,0)"
    val m = base.groupBy($"o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"))
    m.withColumn("slope_raw",
      ($"n".cast(dec) * $"sxy" - $"sx".cast(dec) * $"sy".cast(dec)).cast("double")
        / ($"n".cast(dec) * $"sxx" - $"sx".cast(dec) * $"sx".cast(dec)).cast("double"))
      .select($"o_orderpriority", $"n",
        halfUp($"slope_raw", 6).as("slope_cents_day"),
        halfUp(($"sy".cast("double") - $"slope_raw" * $"sx".cast("double"))
          / $"n".cast("double"), 2).as("intercept_cents"))
      .orderBy("o_orderpriority")
  }

  private val groupRegressionOracle =
    """WITH b AS (SELECT o_orderpriority,
      |             CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
      |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
      |           FROM orders),
      |m AS (SELECT o_orderpriority, count(*) AS n,
      |        sum(x) AS sx, sum(y) AS sy,
      |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
      |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
      |      FROM b GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n,
      |       floor((CAST(n * sxy - sx * sy AS DOUBLE)
      |              / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS slope_cents_day,
      |       floor(((CAST(sy AS DOUBLE)
      |               - (CAST(n * sxy - sx * sy AS DOUBLE)
      |                  / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE))
      |                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) * 100 + 0.5) / 100.0 AS intercept_cents
      |FROM m
      |ORDER BY o_orderpriority""".stripMargin

  /** q71: chi-square independence test — the contingency-table screen for
    * "does order priority depend on customer segment": observed cell
    * counts vs independence expectations, each cell's χ² contribution
    * computed from EXACT integers — term = (obs·n − rt·ct)²/(n·rt·ct)
    * with the numerator squared in decimal/HUGEINT (it exceeds int64) and
    * both sides converted to double once, then the q64 fixed-point
    * running total over the 25-cell frame. Scale: one aggregate over the
    * joined fact; margins and the test statistic on constant frames. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority")
      .agg(count(lit(1)).as("obs"))
    val rt = cells.groupBy($"c_mktsegment").agg(sum($"obs").as("rt"))
    val ct = cells.groupBy($"o_orderpriority").agg(sum($"obs").as("ct"))
    val n = cells.agg(sum($"obs").as("n"))
    val num = $"obs".cast(dec) * $"n" - $"rt".cast(dec) * $"ct"
    val den = $"n".cast(dec) * $"rt" * $"ct"
    val wCum = Window.orderBy($"c_mktsegment", $"o_orderpriority")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(rt), "c_mktsegment").join(broadcast(ct), "o_orderpriority")
      .crossJoin(broadcast(n))
      .withColumn("chi_fp",
        floor((num * num).cast("double") / den.cast("double") * lit(1e6) + lit(0.5))
          .cast("long"))
      .select($"c_mktsegment", $"o_orderpriority", $"obs",
        halfUp(($"rt".cast(dec) * $"ct").cast("double") / $"n".cast("double"), 2)
          .as("expected"),
        halfUp4($"chi_fp".cast("double") / 1e6).as("chi_term"),
        halfUp4(sum($"chi_fp").over(wCum).cast("double") / 1e6).as("chi_cum"))
      .orderBy("c_mktsegment", "o_orderpriority")
  }

  private val chiSquareOracle =
    """WITH cells AS (SELECT c_mktsegment, o_orderpriority, count(*) AS obs
      |               FROM orders JOIN customer ON o_custkey = c_custkey
      |               GROUP BY c_mktsegment, o_orderpriority),
      |rt AS (SELECT c_mktsegment, sum(obs) AS rt FROM cells GROUP BY c_mktsegment),
      |ct AS (SELECT o_orderpriority, sum(obs) AS ct FROM cells GROUP BY o_orderpriority),
      |n AS (SELECT sum(obs) AS n FROM cells),
      |t AS (SELECT c_mktsegment, o_orderpriority, obs, rt, ct, n.n,
      |        CAST(floor(CAST((CAST(obs AS HUGEINT) * n.n - CAST(rt AS HUGEINT) * ct)
      |                        * (CAST(obs AS HUGEINT) * n.n - CAST(rt AS HUGEINT) * ct) AS DOUBLE)
      |                   / CAST(CAST(n.n AS HUGEINT) * rt * ct AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS chi_fp
      |      FROM cells JOIN rt USING (c_mktsegment) JOIN ct USING (o_orderpriority), n)
      |SELECT c_mktsegment, o_orderpriority, obs,
      |       floor((CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 100 + 0.5) / 100.0 AS expected,
      |       floor((CAST(chi_fp AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000.0 AS chi_term,
      |       floor((CAST(sum(chi_fp) OVER (ORDER BY c_mktsegment, o_orderpriority ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000.0) * 10000 + 0.5) / 10000.0 AS chi_cum
      |FROM t
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  /** q72: exact grouped percentiles — order-to-ship lead time (days) per
    * priority at p50/p90/p99, by the q68 predicate technique: one window
    * sort per group, then each percentile is the min value among rows
    * whose inclusive cumulative count covers the target mass
    * (`cum·100 ≥ p·tot` — lower discrete percentile, all integer
    * arithmetic; three conditional mins share ONE window pass). The exact
    * counterpart of q25's approx sketches — the latency-SLO report shape.
    * Scale: one keyed window + one aggregate; no global sort. */
  def leadTimePercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lt = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff($"l_shipdate", $"o_orderdate").cast("long").as("days"),
        $"l_orderkey", $"l_linenumber")
    val wCum = Window.partitionBy($"o_orderpriority")
      .orderBy($"days", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"o_orderpriority")
    def pctl(p: Int) =
      min(when($"cum" * 100 >= $"tot" * p, $"days")).as(s"p$p")
    lt.withColumn("cum", count(lit(1)).over(wCum))
      .withColumn("tot", count(lit(1)).over(wTot))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), pctl(50), pctl(90), pctl(99))
      .orderBy("o_orderpriority")
  }

  private val leadTimePercentilesOracle =
    """WITH lt AS (SELECT o_orderpriority,
      |              CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS days,
      |              l_orderkey, l_linenumber
      |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |c AS (SELECT o_orderpriority, days,
      |        count(*) OVER (PARTITION BY o_orderpriority
      |                       ORDER BY days, l_orderkey, l_linenumber
      |                       ROWS UNBOUNDED PRECEDING) AS cum,
      |        count(*) OVER (PARTITION BY o_orderpriority) AS tot
      |      FROM lt)
      |SELECT o_orderpriority, count(*) AS n,
      |       min(CASE WHEN cum * 100 >= tot * 50 THEN days END) AS p50,
      |       min(CASE WHEN cum * 100 >= tot * 90 THEN days END) AS p90,
      |       min(CASE WHEN cum * 100 >= tot * 99 THEN days END) AS p99
      |FROM c
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q73: top-k churn — which customers persist in the monthly revenue
    * top-10: per month, rank customers by exact cents (tie custkey), keep
    * the top-10, then report every customer who makes the cut at least
    * twice with their appearance count, best rank, and first/last month.
    * The leaderboard-stability view behind account management. Scale: the
    * rank window is per month (bounded frames); the rollup aggregates
    * 10·months rows. */
  def topkChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"), $"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("c"))
    val w = Window.partitionBy($"month").orderBy($"c".desc, $"o_custkey")
    monthly.withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_months"), min($"rk").as("best_rank"),
        min($"month").as("first_month"), max($"month").as("last_month"))
      .filter($"n_months" >= 2)
      .orderBy($"n_months".desc, $"o_custkey")
  }

  private val topkChurnOracle =
    """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey,
      |             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
      |           FROM orders GROUP BY 1, 2),
      |r AS (SELECT month, o_custkey,
      |        row_number() OVER (PARTITION BY month ORDER BY c DESC, o_custkey) AS rk
      |      FROM m)
      |SELECT o_custkey, count(*) AS n_months,
      |       CAST(min(rk) AS INTEGER) AS best_rank,
      |       min(month) AS first_month, max(month) AS last_month
      |FROM r WHERE rk <= 10
      |GROUP BY o_custkey
      |HAVING count(*) >= 2
      |ORDER BY n_months DESC, o_custkey""".stripMargin

  /** Session gap for q74 (seconds) — q22's sessionization constant. */
  private val BounceGapSec = 1800L

  /** q74: bounce rate — per calendar day, the share of user sessions
    * containing exactly one event (the engagement-quality headline):
    * events sessionize by the q22 rule (new session when the gap from the
    * user's previous event exceeds 30 min — one lag window), sessions
    * collapse to (user, session, first-day, n_events), and days aggregate
    * their sessions. Exact counts, one division. Scale: the same
    * user-keyed window q22 runs + two bounded aggregates. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id")
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_sess",
        ($"prev".isNull ||
          unix_timestamp($"ts".cast("timestamp"))
            - unix_timestamp($"prev".cast("timestamp")) > BounceGapSec)
          .cast("long"))
      .withColumn("sess_id", sum($"new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd").as("day"))
    sess.groupBy($"day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(($"n_events" === 1).cast("long")).as("n_bounces"))
      .select($"day", $"n_sessions", $"n_bounces",
        halfUp4($"n_bounces".cast("double") / $"n_sessions".cast("double"))
          .as("bounce_rate"))
      .orderBy("day")
  }

  private val bounceRateOracle =
    s"""WITH e AS (SELECT user_id, ts, event_id,
       |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |           FROM events),
       |s AS (SELECT user_id, ts,
       |        sum(CASE WHEN prev IS NULL
       |                  OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev)) AS BIGINT) > $BounceGapSec
       |                 THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
       |      FROM e),
       |sess AS (SELECT user_id, sess_id, count(*) AS n_events,
       |           strftime(min(ts), '%Y-%m-%d') AS day
       |         FROM s GROUP BY user_id, sess_id)
       |SELECT day, count(*) AS n_sessions,
       |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       |       floor((CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |              / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS bounce_rate
       |FROM sess
       |GROUP BY day
       |ORDER BY day""".stripMargin

  /** q84: sequence-pattern mining (MATCH_RECOGNIZE shape) — each user's
    * whole event journey is serialized to a symbol string (first letter
    * of the event type, ordered by ts then event_id — the five fixture
    * types have distinct initials) and mined with regexes instead of
    * imperative row loops: conversions = non-overlapping `v[ce]*p`
    * matches (view, any clicks/errors, purchase), error bursts =
    * maximal `e+` runs. Both patterns terminate their star class on a
    * symbol the class excludes, so leftmost-greedy (Java regex) and
    * RE2 (DuckDB) agree exactly. Scale: one shuffle on user_id; the
    * per-user string is session-bounded in practice (here journey-
    * bounded, ≤ a few thousand chars); regex work is per-row codegen'd
    * with no joins. */
  def sequenceRegex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val j = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("ch"))
      .groupBy($"user_id")
      .agg(array_join(
        transform(sort_array(collect_list(struct($"ts", $"event_id", $"ch"))),
          x => x.getField("ch")), "").as("journey"))
    j.select($"user_id", length($"journey").as("n_events"),
        regexp_count($"journey", lit("v[ce]*p")).as("n_conversions"),
        regexp_count($"journey", lit("e+")).as("n_error_runs"),
        ($"journey" like "s%").cast("int").as("signup_first"))
      .orderBy("user_id")
  }

  private val sequenceRegexOracle =
    """WITH j AS (
      |  SELECT user_id,
      |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(journey) AS INTEGER) AS n_events,
      |       CAST(len(regexp_extract_all(journey, 'v[ce]*p')) AS INTEGER) AS n_conversions,
      |       CAST(len(regexp_extract_all(journey, 'e+')) AS INTEGER) AS n_error_runs,
      |       CASE WHEN journey LIKE 's%' THEN 1 ELSE 0 END AS signup_first
      |FROM j
      |ORDER BY user_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q84_sequence_regex",
      "MATCH_RECOGNIZE-shaped sequence mining: regex motifs over serialized per-user journeys",
      sequenceRegex, Some(sequenceRegexOracle)),
    QueryDef("q73_topk_churn",
      "Monthly top-10 leaderboard persistence: repeat appearances, best rank, first/last month",
      topkChurn, Some(topkChurnOracle)),
    QueryDef("q74_bounce_rate",
      "Per-day single-event-session bounce rate over gap-sessionized events",
      bounceRate, Some(bounceRateOracle)),
    QueryDef("q72_lead_time_percentiles",
      "Exact grouped p50/p90/p99 lead times via one shared window pass (SLO report shape)",
      leadTimePercentiles, Some(leadTimePercentilesOracle)),
    QueryDef("q71_chi_square",
      "Chi-square independence test on the segment x priority contingency table (exact cross terms)",
      chiSquare, Some(chiSquareOracle)),
    QueryDef("q70_group_regression",
      "Per-group OLS trend lines from exact integer moments (covariance recipe)",
      groupRegression, Some(groupRegressionOracle)),
    QueryDef("q68_weighted_median",
      "Exact lower weighted median (price by quantity mass) per group, integer predicate",
      weightedMedian, Some(weightedMedianOracle)),
    QueryDef("q69_histogram",
      "Equi-width exact-integer histogram with complete bin spine and shares",
      histogram, Some(histogramOracle)),
    QueryDef("q65_k_anonymity",
      "k-anonymity screening over quasi-identifier groups with suppression shares",
      kAnonymity, Some(kAnonymityOracle)),
    QueryDef("q66_event_trigrams",
      "Top-20 consecutive event-type trigram patterns across user journeys",
      eventTrigrams, Some(eventTrigramsOracle)),
    QueryDef("q64_benford",
      "Benford first-digit audit over exact cents with literal expectations and fixed-point chi-square",
      benfordAudit, Some(benfordAuditOracle)),
    QueryDef("q61_dq_report",
      "Referential-integrity / duplicate-key / null-rate data-quality sweep as one report",
      dqReport, Some(dqReportOracle)),
    QueryDef("q62_rfm_segments",
      "RFM customer segmentation: deterministic ntile quartiles rolled up to cells",
      rfmSegments, Some(rfmSegmentsOracle)),
    QueryDef("q63_pareto_deciles",
      "Pareto revenue deciles with exact-cents shares and cumulative 80/20 curve",
      paretoDeciles, Some(paretoDecilesOracle)),
    QueryDef("q56_association_rules",
      "Market-basket association rules (support/confidence/lift) over order×brand baskets",
      associationRules, Some(associationRulesOracle)),
    QueryDef("q57_markov_transitions",
      "Row-normalized Markov transition matrix over per-user event sequences",
      markovTransitions, Some(markovTransitionsOracle)),
    QueryDef("q58_concentration_hhi",
      "Per-nation revenue concentration: exact-numerator HHI + top-customer share",
      concentrationHhi, Some(concentrationHhiOracle)),
    QueryDef("q59_seasonal_anomaly",
      "Hour-of-week seasonal baseline with exact-moment z-score anomaly counts",
      seasonalAnomaly, Some(seasonalAnomalyOracle)),
    QueryDef("q60_cusum_changepoint",
      "Exact-integer CUSUM cumulative deviation over daily revenue with argmax changepoint",
      cusumChangepoint, Some(cusumChangepointOracle)))
}
