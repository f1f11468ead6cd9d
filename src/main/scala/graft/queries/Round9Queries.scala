package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 tier. Opens with the batch-parity pair for the stateful
  * streaming top-k (`IncrementalStream.topkStream`), closing the r8 gap
  * where that operator was spec-only. */
object Round9Queries {

  /** Maintained standings size (mirrors topkStream's default contract:
    * value desc, id asc tie-break). */
  private val StkK = 3

  /** Group-key bound: 40 users gives groups that MISS some micro-batches
    * at small SF, so the emission gating (a group emits standings only
    * after batches it appears in) is actually exercised, not vacuous. */
  private val StkUsers = 40

  /** Fixed micro-batch boundaries over the events fixture's January span
    * — three deterministic deltas, the same split shape StreamingSpec
    * feeds topkStream through MemoryStream. */
  private val StkCut1 = "2024-01-11 00:00:00"
  private val StkCut2 = "2024-01-21 00:00:00"

  /** x117: streaming top-k maintenance, batch-parity unroll — the
    * driver-visible oracle pair for `IncrementalStream.topkStream`
    * (r8's last feature, previously spec-only). The events fixture is
    * split into three fixed micro-batches (Δ₁, Δ₂, Δ₃ by timestamp);
    * the maintained fold state_b = topk(state_{b-1} ∪ Δ_b) is unrolled
    * exactly as the stream's keyed state evolves: per user, the k-row
    * standings fold each delta into the previous k-row buffer, and a
    * user emits standings (with its per-user appearance index `ver`)
    * only after batches it appears in. The oracle recomputes every
    * prefix FROM SCRATCH — the hash match proves the maintenance
    * identity topk(topk(A) ∪ Δ) = topk(A ∪ Δ) on all three prefixes
    * plus the emission gating. Chain of evidence for the streaming
    * operator: StreamingSpec proves topkStream ≡ this fold under
    * arbitrary micro-batch splits (checkpoint-carried state); this
    * query proves the fold ≡ full recompute; together the stream
    * matches the oracle. Scale: the fold re-ranks k·|groups| + |Δ|
    * rows per batch — the stored standings are the tiny side, deltas
    * stream through one keyed shuffle each. */
  def streamTopkParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"user_id" < StkUsers)
      .select($"user_id".as("grp"), $"event_id".as("id"),
        floor($"value" * 100 + 0.5).cast("long").as("v"), $"ts")
    val cut1 = lit(StkCut1).cast("timestamp_ntz")
    val cut2 = lit(StkCut2).cast("timestamp_ntz")
    val deltas = Seq(
      ev.filter($"ts" < cut1),
      ev.filter($"ts" >= cut1 && $"ts" < cut2),
      ev.filter($"ts" >= cut2)).map(_.select($"grp", $"id", $"v"))
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"id")
    def topk(df: DataFrame): DataFrame =
      df.withColumn("rk", row_number().over(w)).filter($"rk" <= StkK)
    // unrolled maintained fold + gated emissions (batch index bi attached)
    var state: DataFrame = null
    val emissions = deltas.zipWithIndex.map { case (delta, i) =>
      val folded = topk(if (state == null) delta
                        else state.unionByName(delta))
      state = folded.drop("rk")
      folded.join(delta.select($"grp").distinct(), Seq("grp"), "left_semi")
        .withColumn("bi", lit(i + 1))
    }
    val union = emissions.reduce(_ unionByName _)
    union
      .withColumn("ver",
        dense_rank().over(Window.partitionBy($"grp").orderBy($"bi")))
      .select($"grp", $"bi", $"ver", $"rk", $"id", $"v")
      .orderBy($"grp", $"bi", $"rk")
  }

  private val streamTopkParityOracle =
    s"""WITH ev AS (
       |  SELECT user_id AS grp, event_id AS id,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
       |         CASE WHEN ts < TIMESTAMP '$StkCut1' THEN 1
       |              WHEN ts < TIMESTAMP '$StkCut2' THEN 2
       |              ELSE 3 END AS bi
       |  FROM events WHERE user_id < $StkUsers),
       |pres AS (SELECT DISTINCT grp, bi FROM ev),
       |emi AS (
       |  SELECT p.grp, p.bi, e.id, e.v,
       |         row_number() OVER (PARTITION BY p.grp, p.bi
       |           ORDER BY e.v DESC, e.id) AS rk
       |  FROM pres p JOIN ev e ON e.grp = p.grp AND e.bi <= p.bi)
       |SELECT grp, bi,
       |       dense_rank() OVER (PARTITION BY grp ORDER BY bi) AS ver,
       |       rk, id, v
       |FROM emi WHERE rk <= $StkK
       |ORDER BY grp, bi, rk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x117_stream_topk_parity",
      "streaming top-k maintenance batch parity: unrolled keyed-state fold + emission gating == per-prefix full recompute oracle",
      streamTopkParity, Some(streamTopkParityOracle)))
}
