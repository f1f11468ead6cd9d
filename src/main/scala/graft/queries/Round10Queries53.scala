package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 fifty-third tier: packing-boundary audit (x230) — the
  * attention-mask cost of x50's streaming sequence packer. */
object Round10Queries53 {

  private val PackShards = 8L
  private val PackBudget = 512L

  /** x230: boundary-straddle audit of the x50 packer — the streaming
    * cum-div packer fills every sequence to the brim by SPLITTING
    * documents across sequence boundaries; each straddling document
    * needs cross-sequence attention masking (or truncation) in
    * training. Per shard: how many documents straddle, the straddled
    * token mass (tokens that land beyond their doc's first sequence),
    * and what truncating at the boundary instead would discard —
    * exact integers derived in CLOSED FORM from the packing columns
    * (straddle ⟺ ⌊cum/B⌋ ≠ ⌊(cum+n−1)/B⌋), no second pass over the
    * packer.
    *
    * Scale: the packing window is x50's audited per-shard prefix sum;
    * the audit adds one projection and a shard-grain aggregate. */
  def packStraddle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = Tables.documents(spark, dir)
      .select($"doc_id", ($"doc_id" % PackShards).as("shard"),
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("seq_a", expr(s"cum_before div $PackBudget"))
      .withColumn("seq_b", expr(s"(cum_before + n_tok - 1) div $PackBudget"))
    packed.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tok"),
        (max($"seq_b") + 1).as("n_seqs"),
        sum(when($"seq_a" =!= $"seq_b", 1L).otherwise(0L)).as("n_straddle"),
        // Tokens beyond the doc's first sequence = what boundary
        // truncation would discard.
        sum(when($"seq_a" =!= $"seq_b",
          $"cum_before" + $"n_tok" - ($"seq_a" + 1) * PackBudget)
          .otherwise(0L)).as("truncated_tok"))
      .select($"shard", $"n_docs", $"n_tok", $"n_seqs", $"n_straddle",
        $"truncated_tok",
        expr("(n_straddle * 1000000) div n_docs").as("straddle_share_fp"))
      .orderBy($"shard")
  }

  private val packStraddleOracle =
    s"""WITH d AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |packed AS (
       |  SELECT *,
       |         CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS cum_before
       |  FROM d),
       |marked AS (
       |  SELECT shard, n_tok, cum_before,
       |         cum_before // $PackBudget AS seq_a,
       |         (cum_before + n_tok - 1) // $PackBudget AS seq_b
       |  FROM packed)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tok,
       |       CAST(max(seq_b) + 1 AS BIGINT) AS n_seqs,
       |       CAST(sum(CASE WHEN seq_a <> seq_b THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_straddle,
       |       CAST(sum(CASE WHEN seq_a <> seq_b THEN
       |              cum_before + n_tok - (seq_a + 1) * $PackBudget
       |            ELSE 0 END) AS BIGINT) AS truncated_tok,
       |       CAST((sum(CASE WHEN seq_a <> seq_b THEN 1 ELSE 0 END) * 1000000)
       |            // count(*) AS BIGINT) AS straddle_share_fp
       |FROM marked GROUP BY shard
       |ORDER BY shard""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x230_pack_straddle",
      "boundary-straddle audit of the x50 packer: straddling docs, cross-boundary token mass, truncation cost — closed form per shard",
      packStraddle, Some(packStraddleOracle)))
}
