package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fortieth tier: graph-partition and temporal-pattern
  * diagnostics — weighted modularity of the nation partition over the
  * co-supply graph (x210), degree assortativity of the same graph
  * (x211), and inter-event burstiness per event type (x212). */
object Round10Queries40 {

  /** Degree cap shared with x66's projection (hot-part blowup guard). */
  private val PartDegCap = 20

  /** Weighted co-supply edges (s1 < s2, w = shared capped parts) plus
    * each supplier's nation — the x66 projection re-derived with its
    * exact pruning so the oracle can mirror it. */
  private def coSupply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("pk"), $"l_suppkey".as("sk")).distinct()
      .localCheckpoint(true)
    val ok = ps.join(ps.groupBy($"pk").agg(count(lit(1)).as("d"))
      .filter($"d" <= PartDegCap).select($"pk"), "pk")
    ok.select($"pk", $"sk".as("s1"))
      .join(ok.select($"pk", $"sk".as("s2")), "pk")
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("w"))
  }

  private val coSupplySql =
    s"""ps AS MATERIALIZED (
       |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |ok AS MATERIALIZED (
       |  SELECT ps.pk, ps.sk FROM ps
       |  JOIN (SELECT pk FROM ps GROUP BY pk
       |        HAVING count(*) <= $PartDegCap) good ON good.pk = ps.pk),
       |edges AS MATERIALIZED (
       |  SELECT a.sk AS s1, b.sk AS s2, CAST(count(*) AS BIGINT) AS w
       |  FROM ok a JOIN ok b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY a.sk, b.sk)""".stripMargin

  // ---------------------------------------------------------------- x210

  /** x210: weighted modularity Q of the nation partition over the
    * co-supply graph — "do suppliers co-supply within their own nation
    * more than a random rewiring would predict?" Per community c:
    * Q_c = e_c/(2m) − (d_c/(2m))², where e_c is twice the intra-
    * community edge weight, d_c the community's weighted degree and m
    * the total edge weight — all exact integer sums; each community
    * term quantizes to 1e-6 before the (order-free) total. Emits one
    * row per nation plus the replicated total (the x199 pattern), so
    * both the headline Q and its decomposition are oracle-checked.
    *
    * Scale: the projection is the x66 degree-capped join; everything
    * after runs on nation-grain aggregates (≤ 25 rows). */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nat = Tables.supplier(spark, dir)
      .select($"s_suppkey".as("sk"), $"s_nationkey".cast("long").as("c"))
      .localCheckpoint(true)
    val e = coSupply(spark, dir)
      .join(broadcast(nat.toDF("s1", "c1")), "s1")
      .join(broadcast(nat.toDF("s2", "c2")), "s2")
      .localCheckpoint(true)
    val m = e.agg(sum($"w").as("m"))
    val intra = e.filter($"c1" === $"c2")
      .groupBy($"c1".as("c")).agg((sum($"w") * 2).as("e_c"))
    val deg = e.select($"c1".as("c"), $"w")
      .unionByName(e.select($"c2".as("c"), $"w"))
      .groupBy($"c").agg(sum($"w").as("d_c"))
    val perC = deg.join(intra, Seq("c"), "left")
      .na.fill(0L, Seq("e_c"))
      .crossJoin(broadcast(m))
      .select($"c", $"e_c", $"d_c",
        expr("CAST(floor((CAST(e_c AS DOUBLE) / CAST(2 * m AS DOUBLE)" +
          " - (CAST(d_c AS DOUBLE) / CAST(2 * m AS DOUBLE))" +
          " * (CAST(d_c AS DOUBLE) / CAST(2 * m AS DOUBLE)))" +
          " * 1000000 + 0.5) AS BIGINT)").as("q_c_fp"))
    val tot = perC.agg(sum($"q_c_fp").as("q_fp"))
    perC.crossJoin(broadcast(tot))
      .select($"c".as("nationkey"), $"e_c", $"d_c", $"q_c_fp", $"q_fp")
      .orderBy($"nationkey")
  }

  private val modularityOracle =
    s"""WITH $coSupplySql,
       |nat AS (SELECT s_suppkey AS sk, CAST(s_nationkey AS BIGINT) AS c
       |        FROM supplier),
       |e2 AS MATERIALIZED (
       |  SELECT e.s1, e.s2, e.w, n1.c AS c1, n2.c AS c2
       |  FROM edges e JOIN nat n1 ON n1.sk = e.s1 JOIN nat n2 ON n2.sk = e.s2),
       |m0 AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM e2),
       |intra AS (SELECT c1 AS c, CAST(sum(w) * 2 AS BIGINT) AS e_c
       |          FROM e2 WHERE c1 = c2 GROUP BY c1),
       |deg AS (
       |  SELECT c, CAST(sum(w) AS BIGINT) AS d_c FROM (
       |    SELECT c1 AS c, w FROM e2 UNION ALL SELECT c2 AS c, w FROM e2) u
       |  GROUP BY c),
       |per_c AS (
       |  SELECT d.c, COALESCE(i.e_c, 0) AS e_c, d.d_c,
       |         CAST(floor((CAST(COALESCE(i.e_c, 0) AS DOUBLE)
       |             / CAST(2 * m AS DOUBLE)
       |           - (CAST(d.d_c AS DOUBLE) / CAST(2 * m AS DOUBLE))
       |             * (CAST(d.d_c AS DOUBLE) / CAST(2 * m AS DOUBLE)))
       |           * 1000000 + 0.5) AS BIGINT) AS q_c_fp
       |  FROM deg d LEFT JOIN intra i ON i.c = d.c, m0),
       |tot AS (SELECT CAST(sum(q_c_fp) AS BIGINT) AS q_fp FROM per_c)
       |SELECT c AS nationkey, e_c, d_c, q_c_fp, q_fp
       |FROM per_c, tot ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- x211

  /** x211: degree assortativity — the Pearson correlation of endpoint
    * weighted degrees over the (symmetrized) co-supply edge list:
    * positive ⇒ hubs co-supply with hubs. Every moment (ΣX, ΣY, ΣXY,
    * ΣX², ΣY², M) is an exact integer sum; the one sqrt is IEEE
    * correctly-rounded so it is engine-stable, and the formula is
    * spelled out identically on both sides (the q75/q77 recipe).
    *
    * Scale: degree table + one broadcast-joined edge pass; moments
    * are map-side combined. */
  def assortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = coSupply(spark, dir).localCheckpoint(true)
    val deg = e.select($"s1".as("sk"), $"w")
      .unionByName(e.select($"s2".as("sk"), $"w"))
      .groupBy($"sk").agg(sum($"w").as("d"))
    val sym = e.select($"s1".as("a"), $"s2".as("b"))
      .unionByName(e.select($"s2".as("a"), $"s1".as("b")))
    val xy = sym
      .join(broadcast(deg.toDF("a", "dx")), "a")
      .join(broadcast(deg.toDF("b", "dy")), "b")
    xy.agg(count(lit(1)).as("m"), sum($"dx").as("sx"), sum($"dy").as("sy"),
      sum($"dx" * $"dy").as("sxy"), sum($"dx" * $"dx").as("sxx"),
      sum($"dy" * $"dy").as("syy"))
      .select($"m",
        expr("CAST(floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
          " / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
          " * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)" +
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))" +
          " * 1000000 + 0.5) AS BIGINT)").as("r_fp"))
  }

  private val assortativityOracle =
    s"""WITH $coSupplySql,
       |deg AS MATERIALIZED (
       |  SELECT sk, CAST(sum(w) AS BIGINT) AS d FROM (
       |    SELECT s1 AS sk, w FROM edges UNION ALL SELECT s2 AS sk, w FROM edges) u
       |  GROUP BY sk),
       |sym AS (SELECT s1 AS a, s2 AS b FROM edges
       |        UNION ALL SELECT s2 AS a, s1 AS b FROM edges),
       |xy AS (SELECT da.d AS dx, db.d AS dy
       |       FROM sym JOIN deg da ON da.sk = sym.a JOIN deg db ON db.sk = sym.b),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(dx) AS BIGINT) AS sx,
       |         CAST(sum(dy) AS BIGINT) AS sy, CAST(sum(dx * dy) AS BIGINT) AS sxy,
       |         CAST(sum(dx * dx) AS BIGINT) AS sxx,
       |         CAST(sum(dy * dy) AS BIGINT) AS syy
       |  FROM xy)
       |SELECT m,
       |       CAST(floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
       |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |         / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
       |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |         * 1000000 + 0.5) AS BIGINT) AS r_fp
       |FROM mom""".stripMargin

  // ---------------------------------------------------------------- x212

  /** x212: burstiness — per event type, the Goh–Barabási coefficient
    * B = (σ−μ)/(σ+μ) of a user's inter-event seconds (−1 periodic,
    * 0 Poisson, →1 bursty), averaged over users with ≥ 3 events of
    * that type. Inter-arrival seconds are exact integers; per-user σ
    * uses the sample-variance moment identity with one IEEE sqrt, B
    * quantizes to 1e-6 per user, and the per-type mean is an integer
    * div — order-free everywhere.
    *
    * Scale: one (user, type)-keyed window for the lags, one grouped
    * moment pass; nothing data-sized after that. */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"sec", $"event_id")
    val iat = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
      .select($"user_id", $"event_type",
        ($"sec" - lag($"sec", 1).over(w)).as("x"))
      .filter($"x".isNotNull)
    val perUser = iat.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .filter($"n" >= 2) // ≥3 events ⇒ ≥2 inter-arrival gaps
      .select($"event_type",
        expr("CAST(floor((sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))" +
          " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))" +
          " / (sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))" +
          " + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))" +
          " * 1000000 + 0.5) AS BIGINT)").as("b_fp"))
    perUser.groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(floor(CAST(sum(b_fp) AS DOUBLE) / CAST(count(1) AS DOUBLE))" +
          " AS BIGINT)").as("mean_b_fp"),
        min($"b_fp").as("min_b_fp"), max($"b_fp").as("max_b_fp"))
      .orderBy($"event_type")
  }

  private val burstinessOracle =
    """WITH iat AS (
      |  SELECT user_id, event_type,
      |         sec - lag(sec) OVER (PARTITION BY user_id, event_type
      |                              ORDER BY sec, event_id) AS x
      |  FROM (SELECT user_id, event_type, event_id,
      |               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      |        FROM events) t),
      |per_user AS (
      |  SELECT event_type,
      |         CAST(floor((sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
      |           - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           / (sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
      |           + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           * 1000000 + 0.5) AS BIGINT) AS b_fp
      |  FROM (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(x) AS BIGINT) AS sx,
      |               CAST(sum(x * x) AS BIGINT) AS sxx
      |        FROM iat WHERE x IS NOT NULL GROUP BY user_id, event_type) m
      |  WHERE n >= 2)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(floor(CAST(sum(b_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_b_fp,
      |       CAST(min(b_fp) AS BIGINT) AS min_b_fp,
      |       CAST(max(b_fp) AS BIGINT) AS max_b_fp
      |FROM per_user GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x210_modularity",
      "weighted modularity of the nation partition over the x66 co-supply graph: per-community quantized terms plus replicated total",
      modularity, Some(modularityOracle)),
    QueryDef("x211_assortativity",
      "degree assortativity of the co-supply graph: exact integer moments over the symmetrized edge list, one IEEE sqrt",
      assortativity, Some(assortativityOracle)),
    QueryDef("x212_burstiness",
      "Goh-Barabasi burstiness of inter-event gaps per event type: per-user quantized B, integer-div mean over users",
      burstiness, Some(burstinessOracle)))
}
