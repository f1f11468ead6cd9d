package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{AsOf, Scd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 eighth tier: the leakage-safe point-in-time lookup that
  * completes the SCD2 story (build q47 → stream x148 → apply Scd.scd2Apply
  * → LOOKUP here), and a TPC-H Q21-shaped decorrelation parity proof. */
object Round10Queries8 {

  /** x133/x148's cohort bound. */
  private val PitUsers = 40

  /** x156: point-in-time (as-of) lookup against the SCD2 dimension — the
    * feature-store join every training pipeline needs: for each label
    * event, fetch the user's dimension state STRICTLY BEFORE the
    * cutoff (ts − 1 h), never the state written at or after it — the
    * leakage rule. The dim is q47's scd2Build output; the lookup is the
    * x60 carry-forward as-of (one shuffle, no interval explosion), with a
    * per-(user, valid_from) last-writer guard so the right side is unique
    * as AsOf.joinPrior requires. Emitted as the (feature_state ×
    * label_type) contingency matrix a leakage audit inspects — `none`
    * rows are events whose cutoff predates the user's first version (the
    * cold-start case a feature store must surface, not fabricate).
    *
    * Scale: scd2Build is one user-shuffle; the as-of is one more (union +
    * carry-forward window) — O(|events| + |versions|) rows, no range
    * blow-up. At 100 TB the dim is orders of magnitude smaller than the
    * label stream, which is exactly when as-of-by-union beats an
    * interval join. */
  def pointInTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"user_id" < PitUsers)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val dim = Scd.scd2Build(ev)
      .select($"user_id", $"valid_from", $"version",
        $"event_type".as("state_type"))
    // last-writer-wins per (user, valid_from): two changes in the same
    // microsecond would break joinPrior's right-side uniqueness contract
    val wDedup = Window.partitionBy($"user_id", $"valid_from")
      .orderBy($"version".desc)
    val dimU = dim.withColumn("rn", row_number().over(wDedup))
      .filter($"rn" === 1).drop("rn", "version")
    val facts = ev.select($"user_id", $"event_id",
      $"event_type".as("label_type"),
      ($"ts" - expr("INTERVAL 1 HOUR")).as("t"))
    AsOf.joinPrior(facts, dimU, "user_id", "t", "valid_from", Seq("state_type"))
      .groupBy(coalesce($"asof_state_type", lit("none")).as("feature_state"),
        $"label_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("feature_state", "label_type")
  }

  private val pointInTimeJoinOracle =
    s"""WITH e AS (SELECT user_id, ts, event_id, event_type
       |           FROM events WHERE user_id < $PitUsers),
       |s AS (SELECT user_id, ts, event_id, event_type,
       |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |      FROM e),
       |c AS (SELECT user_id, ts AS valid_from, event_type,
       |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
       |      FROM s WHERE prev IS NULL OR prev <> event_type),
       |dimu AS (SELECT user_id, valid_from, event_type AS state_type
       |         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, valid_from
       |                          ORDER BY version DESC) AS rn FROM c)
       |         WHERE rn = 1),
       |f AS (SELECT user_id, event_id, event_type AS label_type,
       |        ts - INTERVAL 1 HOUR AS t FROM e)
       |SELECT coalesce(d.state_type, 'none') AS feature_state, f.label_type,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM f ASOF LEFT JOIN dimu d
       |  ON f.user_id = d.user_id AND f.t > d.valid_from
       |GROUP BY 1, 2
       |ORDER BY feature_state, label_type""".stripMargin

  /** x157: TPC-H Q21-shaped decorrelation parity — the "sole late
    * supplier on a multi-supplier order" query whose textbook form is an
    * EXISTS plus a NOT EXISTS correlated self-join pair. The Spark side
    * runs the DECORRELATED plan a scale-aware engine wants: ONE pass
    * computes per-order supplier and late-supplier distinct counts, then
    * a single equi-join + filter replaces both correlated subqueries; the
    * oracle runs the literal EXISTS/NOT-EXISTS form, and the hash match
    * proves the rewrite is semantics-preserving (the manual analogue of
    * Catalyst's RewriteCorrelatedScalarSubquery family).
    *
    * Scale: naive Q21 is two self-joins of the fact table against itself
    * (quadratic per order at worst); the decorrelated form is one
    * aggregate + one join, each a single l_orderkey shuffle. */
  def soleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val perOrder = li.groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"l_returnflag" === "R", $"l_suppkey")).as("n_late_supp"))
    val late = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey").distinct()
    late.join(perOrder, "l_orderkey")
      .filter($"n_supp" > 1 && $"n_late_supp" === 1)
      .join(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(25)
  }

  private val soleLateSupplierOracle =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      |      FROM lineitem l1
      |      WHERE l1.l_returnflag = 'R'
      |        AND EXISTS (SELECT 1 FROM lineitem l2
      |                    WHERE l2.l_orderkey = l1.l_orderkey
      |                      AND l2.l_suppkey <> l1.l_suppkey)
      |        AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                        WHERE l3.l_orderkey = l1.l_orderkey
      |                          AND l3.l_suppkey <> l1.l_suppkey
      |                          AND l3.l_returnflag = 'R')) w
      |JOIN supplier ON w.l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 25""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x156_point_in_time_join",
      "leakage-safe point-in-time lookup against the SCD2 dim: strictly-before as-of carry-forward, feature x label contingency audit",
      pointInTimeJoin, Some(pointInTimeJoinOracle)),
    QueryDef("x157_sole_late_supplier",
      "TPC-H Q21-shape decorrelation parity: one-pass per-order counts + equi-join == literal EXISTS/NOT-EXISTS oracle",
      soleLateSupplier, Some(soleLateSupplierOracle)))
}
