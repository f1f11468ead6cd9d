package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 seventh tier: exact integer apportionment of a training token
  * budget across corpus sources — the arithmetic that turns x53/x85's
  * mixture WEIGHTS into per-source token QUOTAS that sum exactly to the
  * budget. */
object Round10Queries7 {

  /** Token budget to apportion (chosen so remainders are non-trivial at
    * every SF). */
  private val Budget = 12345L

  /** x155: largest-remainder token-budget apportionment — given per-source
    * token masses, allocate an exact total budget proportionally:
    * floor quotas first, then one extra token-share to the k sources with
    * the largest remainders (k = the floor shortfall), ties broken by
    * source name. The result sums EXACTLY to the budget (the property
    * naive rounding violates), every step is integer arithmetic
    * (remainders compared as `B·tᵢ mod T` — no doubles), and the emitted
    * `share` column shows the realized vs ideal proportion. This is the
    * mixture-sampling prelude: x53 samples BY these quotas; this query is
    * where the quotas come from.
    *
    * Scale: one aggregate over sources plus rank/arithmetic on the
    * |sources| frame — corpus-size-free after the first shuffle. The
    * `B·tᵢ` products need ~log2(B)+log2(T) bits; a 100 TB deployment
    * pre-scales tᵢ (the doc notes the bound) or moves to DECIMAL. */
  def tokenBudgetApportion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.documents(spark, dir)
      .select($"source", size(split($"text", " ")).cast("long").as("n_tok"))
      .groupBy($"source").agg(sum($"n_tok").as("t"))
    val tot = t.agg(sum($"t").as("tt"), count(lit(1)).as("n_src"))
    val q = t.crossJoin(broadcast(tot))
      .select($"source", $"t", $"tt",
        expr(s"($Budget * t) DIV tt").as("quota_floor"),
        ((lit(Budget) * $"t") % $"tt").as("rem"))
    val short = q.agg((lit(Budget) - sum($"quota_floor")).as("k"))
    val w = Window.orderBy($"rem".desc, $"source")
    q.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(w))
      .select($"source", $"t".as("n_tokens"), $"quota_floor",
        ($"rk" <= $"k").cast("long").as("extra"),
        ($"quota_floor" + ($"rk" <= $"k").cast("long")).as("alloc"),
        halfUp4($"t".cast("double") / $"tt".cast("double")).as("ideal_share"),
        halfUp4(($"quota_floor" + ($"rk" <= $"k").cast("long")).cast("double")
          / lit(Budget.toDouble)).as("alloc_share"))
      .orderBy("source")
  }

  private val tokenBudgetApportionOracle =
    s"""WITH t AS (SELECT source,
       |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
       |           FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM t),
       |q AS (SELECT source, t, tt,
       |        ($Budget * t) // tt AS quota_floor,
       |        ($Budget * t) % tt AS rem
       |      FROM t CROSS JOIN tot),
       |s AS (SELECT CAST($Budget - sum(quota_floor) AS BIGINT) AS k FROM q),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
       |      FROM q CROSS JOIN s)
       |SELECT source, t AS n_tokens, quota_floor,
       |       CAST(rk <= k AS BIGINT) AS extra,
       |       quota_floor + CAST(rk <= k AS BIGINT) AS alloc,
       |       floor(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE) * 10000 + 0.5) / 10000.0 AS ideal_share,
       |       floor(CAST(quota_floor + CAST(rk <= k AS BIGINT) AS DOUBLE) / ${Budget}.0
       |             * 10000 + 0.5) / 10000.0 AS alloc_share
       |FROM r
       |ORDER BY source""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x155_token_budget_apportion",
      "largest-remainder apportionment of an exact token budget across sources: integer quotas that sum to the budget, tie-broken deterministically",
      tokenBudgetApportion, Some(tokenBudgetApportionOracle)))
}
