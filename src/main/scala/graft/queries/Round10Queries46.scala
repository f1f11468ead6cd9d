package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 forty-sixth tier: partial autocorrelation (x222) — the
  * AR-order diagnostic q85's ACF builds toward, via an unrolled
  * Durbin–Levinson recursion whose every formula string is SHARED
  * between the Spark plan and the DuckDB oracle. */
object Round10Queries46 {

  /** PACF depth. */
  private val PacfMax = 5

  /** Durbin–Levinson step formulas, emitted once and spliced verbatim
    * into both engines (all double arithmetic on identical inputs in
    * an identical association order ⇒ bit-identical φ's).
    * Returns (colName, sqlExpr) in dependency order. */
  private val dlSteps: Seq[(String, String)] = {
    def dot(phis: Seq[String], rhos: Seq[String]): String =
      phis.zip(rhos).map { case (p, r) => s"$p * $r" }
        .reduceLeft((a, b) => s"($a + $b)")
    val steps = scala.collection.mutable.ArrayBuffer[(String, String)]()
    steps += ("p11" -> "r1")
    for (k <- 2 to PacfMax) {
      val prev = (1 until k).map(j => s"p${k - 1}$j")
      val rhosDesc = (1 until k).map(j => s"r${k - j}")
      val rhosAsc = (1 until k).map(j => s"r$j")
      val num = s"(r$k - ${dot(prev, rhosDesc)})"
      val den = s"(1.0 - ${dot(prev, rhosAsc)})"
      steps += (s"p$k$k" -> s"CASE WHEN $den <> 0.0 THEN $num / $den ELSE 0.0 END")
      for (j <- 1 until k)
        steps += (s"p$k$j" -> s"p${k - 1}$j - p$k$k * p${k - 1}${k - j}")
    }
    steps.toSeq
  }

  /** x222: PACF(1..5) of the daily-revenue series — the diagnostic that
    * separates "AR(p) signal" from ACF carry-over: φ_kk is the
    * correlation at lag k AFTER regressing out lags 1..k−1. The ρ's
    * are q85's exact-moment ACF (decimal-centered integer sums cast to
    * double once); the Durbin–Levinson recursion then runs entirely in
    * doubles whose formula strings are generated ONCE in Scala and
    * spliced into both engines, so the recursion is bit-identical by
    * construction and only the published φ_kk quantize (half-up, 6dp).
    *
    * Scale: one date-grain aggregate, five lag self-joins on the
    * day-grain frame (broadcast lag table), then a 1-row scalar
    * pipeline — series length never matters past the first shuffle. */
  def pacf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff($"o_orderdate", lit("1995-01-01").cast("date"))
        .cast("long").as("di"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("y"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val c = daily.crossJoin(broadcast(tot))
      .select($"di", ($"n".cast(dec) * $"y".cast(dec) - $"s".cast(dec)).as("cy"))
      .localCheckpoint(true)
    val den = c.agg(sum($"cy" * $"cy").as("dd"))
    val lags = spark.range(1, PacfMax + 1).select($"id".cast("long").as("lag"))
    val nums = c.select($"di", $"cy").crossJoin(broadcast(lags))
      .join(c.select($"di".as("dj"), $"cy".as("cz")), $"dj" === $"di" + $"lag")
      .groupBy($"lag").agg(sum($"cy" * $"cz").as("num"))
    val rhos = nums.crossJoin(broadcast(den))
      .select($"lag", ($"num".cast("double") / $"dd".cast("double")).as("rho"))
      .groupBy()
      .pivot("lag", (1 to PacfMax).map(_.toLong))
      .agg(first($"rho"))
      .toDF((1 to PacfMax).map(k => s"r$k"): _*)
    val withPhis = dlSteps.foldLeft(rhos) { case (df, (name, sql)) =>
      df.withColumn(name, expr(sql))
    }
    val stackExpr = (1 to PacfMax)
      .map(k => s"CAST($k AS BIGINT), CAST(floor(p$k$k * 1000000 + 0.5)" +
        " AS BIGINT)")
      .mkString(s"stack($PacfMax, ", ", ", ") AS (lag, pacf_fp)")
    withPhis.select(expr(stackExpr)).orderBy($"lag")
  }

  private val pacfOracle = {
    val phiCtes = {
      // Group the DL steps into one CTE per order k (each references the
      // previous CTE's columns).
      val byK = dlSteps.groupBy { case (name, _) => name.charAt(1) }
      (1 to PacfMax).map { k =>
        val cols = byK(('0' + k).toChar)
          .map { case (name, sql) => s"$sql AS $name" }
        val carry = if (k == 1) "rhos.*" else s"phi${k - 1}.*"
        // Columns of order k depend on each other (pkk feeds pkj): emit
        // pkk in an inner select, then the pkj's outside.
        val (diag, offdiag) = cols.partition(_.endsWith(s"p$k$k"))
        if (offdiag.isEmpty)
          s"phi$k AS (SELECT $carry, ${diag.head} FROM ${if (k == 1) "rhos" else s"phi${k - 1}"})"
        else
          s"""phi$k AS (
             |  SELECT *, ${offdiag.mkString(", ")} FROM (
             |    SELECT $carry, ${diag.head}
             |    FROM ${if (k == 1) "rhos" else s"phi${k - 1}"}) inner$k)""".stripMargin
      }.mkString(",\n")
    }
    val outRows = (1 to PacfMax)
      .map(k => s"SELECT CAST($k AS BIGINT) AS lag," +
        s" CAST(floor(p$k$k * 1000000 + 0.5) AS BIGINT) AS pacf_fp FROM phi$PacfMax")
      .mkString("\n  UNION ALL ")
    s"""WITH daily AS MATERIALIZED (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |              AS BIGINT) AS di,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |              AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT count(*) AS n, sum(y) AS s FROM daily),
       |c AS MATERIALIZED (SELECT di, CAST(n AS HUGEINT) * y - s AS cy
       |                   FROM daily, tot),
       |den AS (SELECT sum(cy * cy) AS dd FROM c),
       |lags AS (SELECT CAST(unnest(range(1, ${PacfMax + 1})) AS BIGINT) AS lag),
       |nums AS (
       |  SELECT l.lag, sum(a.cy * b.cz) AS num
       |  FROM c a CROSS JOIN lags l
       |  JOIN (SELECT di AS dj, cy AS cz FROM c) b ON b.dj = a.di + l.lag
       |  GROUP BY l.lag),
       |rhos AS (
       |  SELECT ${(1 to PacfMax).map(k =>
            s"max(CASE WHEN lag = $k THEN CAST(num AS DOUBLE)" +
              s" / CAST(dd AS DOUBLE) END) AS r$k").mkString(", ")}
       |  FROM nums, den),
       |$phiCtes
       |$outRows
       |ORDER BY lag""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x222_pacf",
      "partial autocorrelation 1..5 via unrolled Durbin-Levinson with engine-shared formula strings over q85's exact-moment ACF",
      pacf, Some(pacfOracle)))
}
