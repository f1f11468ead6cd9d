package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 seventh tier: iterative proportional fitting (IPF / raking /
  * Sinkhorn matrix scaling) as a fixed-point INTEGER iteration — the
  * survey-calibration and ads-measurement weighting primitive (and the
  * Sinkhorn kernel of entropic optimal transport), oracle-paired
  * bit-for-bit by quantizing every scaling factor to integer
  * micro-units with truncating division (the x317 convention).
  */
object Round13Queries7 {

  /** Full row-step + col-step iterations. */
  private val IpfIters = 4
  /** Fixed-point scale (micro-units). */
  private val IpfScale = 1000000L

  /** x330: IPF raking of the (event_type × day-of-week) activity matrix
    * to uniform margins — reweight each cell so every event type and
    * every weekday carries an equal share of total mass, the classic
    * post-stratification calibration (DeVille–Särndal raking; the same
    * alternating row/col scaling is Sinkhorn's algorithm for doubly-
    * stochastic matrix balancing). [[IpfIters]] full iterations, each
    * factor quantized: f_r = (target·10⁶) quot rowMass, w ← (w·f) quot
    * 10⁶ — BIGINT-exact, so both engines walk the identical fixed-point
    * trajectory (a double implementation would need order-free sums per
    * margin; integers get that for free). Emits final weights and the
    * post-fit row/col masses so the residual imbalance is inspectable
    * (IPF converges geometrically; 4 iterations leave per-mille
    * residue).
    *
    * Scale: the cell census (|types|·|weekdays| rows) is all the
    * iteration touches — the corpus pass is one map-side-combinable
    * groupBy; margins are tiny aggregates joined back broadcast. The
    * factor arithmetic target·10⁶ runs in DECIMAL(38)/HUGEINT on both
    * sides (a BIGINT intermediate overflows SILENTLY in non-ANSI Spark
    * at ~5·10⁷ events while the oracle errors — r13 code-review catch);
    * the remaining BIGINT bound is the driver-side target itself,
    * total·10⁶ < 2⁶³ (~9·10¹² events). */
  def ipfRaking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells0 = Tables.events(spark, dir)
      .select($"event_type", dayofweek($"ts").cast("long").as("dow"))
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("n"))
      .withColumn("w", lit(IpfScale))
      .localCheckpoint(true)
    val tot = cells0.agg(sum($"n")).head.getLong(0)
    val nRows = cells0.select($"event_type").distinct().count()
    val nCols = cells0.select($"dow").distinct().count()
    val tRow = tot * IpfScale / nRows
    val tCol = tot * IpfScale / nCols
    var cells = cells0
    (1 to IpfIters).foreach { _ =>
      val rm = cells.groupBy($"event_type").agg(sum($"n" * $"w").as("rm"))
      cells = cells.join(broadcast(rm), "event_type")
        .withColumn("w", expr(
          s"(w * CAST((CAST(${tRow}L AS DECIMAL(38,0)) * CAST($IpfScale AS DECIMAL(38,0)))" +
            s" DIV CAST(rm AS DECIMAL(38,0)) AS BIGINT)) DIV $IpfScale"))
        .drop("rm")
      val cm = cells.groupBy($"dow").agg(sum($"n" * $"w").as("cm"))
      cells = cells.join(broadcast(cm), "dow")
        .withColumn("w", expr(
          s"(w * CAST((CAST(${tCol}L AS DECIMAL(38,0)) * CAST($IpfScale AS DECIMAL(38,0)))" +
            s" DIV CAST(cm AS DECIMAL(38,0)) AS BIGINT)) DIV $IpfScale"))
        .drop("cm")
        .localCheckpoint(true)
    }
    val rmF = cells.groupBy($"event_type").agg(sum($"n" * $"w").as("row_mass"))
    val cmF = cells.groupBy($"dow").agg(sum($"n" * $"w").as("col_mass"))
    cells.join(broadcast(rmF), "event_type").join(broadcast(cmF), "dow")
      .select($"event_type", $"dow", $"n", $"w", $"row_mass", $"col_mass")
      .orderBy($"event_type", $"dow")
  }

  private val ipfOracle = {
    // unrolled row/col steps; targets computed exactly as the Spark side
    // does (total DIV margin-count, then ·10⁶ inside the factor)
    val steps = (1 to IpfIters).flatMap { k =>
      Seq(
        s"""r$k AS (
           |  SELECT c.event_type, c.dow, c.n,
           |         (c.w * CAST((CAST(trow AS HUGEINT) * $IpfScale) // rm AS BIGINT)) // $IpfScale AS w
           |  FROM ${if (k == 1) "c0" else s"c${k - 1}"} c
           |  JOIN (SELECT event_type, CAST(sum(n * w) AS BIGINT) AS rm
           |        FROM ${if (k == 1) "c0" else s"c${k - 1}"} GROUP BY 1) m
           |    ON m.event_type = c.event_type, t)""".stripMargin,
        s"""c$k AS (
           |  SELECT c.event_type, c.dow, c.n,
           |         (c.w * CAST((CAST(tcol AS HUGEINT) * $IpfScale) // cm AS BIGINT)) // $IpfScale AS w
           |  FROM r$k c
           |  JOIN (SELECT dow, CAST(sum(n * w) AS BIGINT) AS cm
           |        FROM r$k GROUP BY 1) m ON m.dow = c.dow, t)""".stripMargin)
    }.mkString(",\n")
    s"""WITH c0 AS MATERIALIZED (
       |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST($IpfScale AS BIGINT) AS w
       |  FROM events GROUP BY 1, 2),
       |t AS (
       |  SELECT CAST(sum(n) * $IpfScale // count(DISTINCT event_type) AS BIGINT) AS trow,
       |         CAST(sum(n) * $IpfScale // count(DISTINCT dow) AS BIGINT) AS tcol
       |  FROM c0),
       |$steps
       |SELECT c.event_type, c.dow, c.n, c.w,
       |       CAST(rm.row_mass AS BIGINT) AS row_mass,
       |       CAST(cm.col_mass AS BIGINT) AS col_mass
       |FROM c$IpfIters c
       |JOIN (SELECT event_type, sum(n * w) AS row_mass FROM c$IpfIters GROUP BY 1) rm
       |  ON rm.event_type = c.event_type
       |JOIN (SELECT dow, sum(n * w) AS col_mass FROM c$IpfIters GROUP BY 1) cm
       |  ON cm.dow = c.dow
       |ORDER BY c.event_type, c.dow""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x330_ipf_raking",
      "IPF/Sinkhorn raking to uniform margins as a fixed-point integer iteration: quantized factors, bit-identical trajectories",
      ipfRaking, Some(ipfOracle)))
}
