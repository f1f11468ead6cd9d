package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 eighteenth tier: the attribute-value-independence (AVI)
  * audit — the assumption every textbook cardinality estimator makes
  * and the single biggest source of optimizer misestimates. For five
  * canonical lineitem predicates, ONE scan produces all marginal and
  * pairwise-conjunction counts (0/1 flag sums + flag-product sums);
  * per pair we emit the independence estimate `c_i·c_j/n` against the
  * true conjunction count and the q-error — exactly the signal a CBO
  * (q107) needs to know when to distrust its own selectivity math.
  */
object Round11Queries18 {

  /** The audited predicates, shared verbatim with the oracle. */
  private val Preds: Seq[(String, String)] = Seq(
    ("rf_r", "l_returnflag = 'R'"),
    ("ls_f", "l_linestatus = 'F'"),
    ("qty_low", "l_quantity <= 25.0"),
    ("disc_hi", "l_discount >= 0.05"),
    ("pre98", "year(l_shipdate) < 1998"))

  // ---------------------------------------------------------------- x284

  /** x284: AVI / independence audit. All C(5,2)=10 predicate pairs from
    * one aggregation pass: each predicate becomes a 0/1 flag column,
    * marginals are flag sums, conjunctions are flag-product sums — no
    * second scan, no per-pair jobs. The q-error
    * `max(est, act)/min(est, act)` is the standard optimizer-quality
    * metric; est is the rational `c_i·c_j/n` (doubles from identical
    * integers).
    *
    * Scale: one corpus scan into an 16-column aggregate; the pair
    * report is O(pairs) arithmetic. This is how you audit AVI on
    * 100 TB without 10 separate count(*) jobs. */
  def aviAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flagged = Preds.foldLeft(Tables.lineitem(spark, dir)) {
      case (df, (name, sql)) =>
        df.withColumn(s"f_$name", when(expr(sql), 1L).otherwise(0L))
    }
    val pairs = Preds.combinations(2).toSeq.map { case Seq((a, _), (b, _)) => (a, b) }
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        Preds.map { case (name, _) => sum(col(s"f_$name")).as(s"c_$name") } ++
        pairs.map { case (a, b) =>
          sum(col(s"f_$a") * col(s"f_$b")).as(s"c_${a}__$b")
        }
    val cells = flagged.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("pred_i"), lit(b).as("pred_j"),
        col(s"c_$a").as("ci"), col(s"c_$b").as("cj"),
        col(s"c_${a}__$b").as("cij"))
    }
    cells.select($"n", explode(array(rows: _*)).as("p"))
      .select($"p.pred_i".as("pred_i"), $"p.pred_j".as("pred_j"), $"n",
        $"p.ci".as("ci"), $"p.cj".as("cj"), $"p.cij".as("cij"))
      .withColumn("est",
        $"ci".cast("double") * $"cj".cast("double") / $"n".cast("double"))
      .select($"pred_i", $"pred_j", $"n", $"ci", $"cj", $"cij",
        QueryUtil.halfUp4($"est").as("est_rows"),
        QueryUtil.halfUp4(
          greatest($"est", $"cij".cast("double"))
            / least($"est", $"cij".cast("double"))).as("q_error"))
      .orderBy($"pred_i", $"pred_j")
  }

  private val aviAuditOracle = {
    val flagCols = Preds.map { case (name, sql) =>
      s"CASE WHEN $sql THEN 1 ELSE 0 END AS f_$name"
    }.mkString(",\n|         ")
    val pairList = Preds.combinations(2).toSeq.map { case Seq((a, _), (b, _)) => (a, b) }
    val cellAggs =
      (Preds.map { case (name, _) =>
        s"CAST(sum(f_$name) AS BIGINT) AS c_$name"
      } ++ pairList.map { case (a, b) =>
        s"CAST(sum(f_$a * f_$b) AS BIGINT) AS c_${a}__$b"
      }).mkString(",\n|         ")
    val branches = pairList.map { case (a, b) =>
      s"SELECT '$a' AS pred_i, '$b' AS pred_j, n, c_$a AS ci, c_$b AS cj, c_${a}__$b AS cij FROM cells"
    }.mkString("\n|  UNION ALL ")
    s"""WITH flagged AS (
       |  SELECT $flagCols
       |  FROM lineitem),
       |cells AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         $cellAggs
       |  FROM flagged),
       |pairs AS (
       |  $branches)
       |SELECT pred_i, pred_j, n, ci, cj, cij,
       |       floor(CAST(ci AS DOUBLE) * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE)
       |             * 10000 + 0.5) / 10000.0 AS est_rows,
       |       floor(greatest(CAST(ci AS DOUBLE) * CAST(cj AS DOUBLE)
       |                        / CAST(n AS DOUBLE), CAST(cij AS DOUBLE))
       |             / least(CAST(ci AS DOUBLE) * CAST(cj AS DOUBLE)
       |                       / CAST(n AS DOUBLE), CAST(cij AS DOUBLE))
       |             * 10000 + 0.5) / 10000.0 AS q_error
       |FROM pairs
       |ORDER BY pred_i, pred_j""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x284_avi_audit",
      "attribute-value-independence audit: pairwise selectivity q-errors from one scan",
      aviAudit, Some(aviAuditOracle)))
}
