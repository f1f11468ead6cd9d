package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 fifteenth tier: kNN majority-vote classification eval (the
  * instance-based counterpart of x79's nearest-centroid classifier) and
  * decimal-exact aggregation parity (the money-type surface the integer-
  * cents convention has been standing in for). */
object Round10Queries15 {

  /** x169: k-nearest-neighbor classifier evaluation — leave-the-cohort-out:
    * test vectors (vec_id % 50 = 0) are classified by majority label of
    * their 5 highest-cosine TRAIN neighbors (train = everything else, so
    * no self-match leakage), ties broken toward the smaller label —
    * deterministic end to end. Complements x79 (nearest-centroid: one
    * broadcast model row per class) with the instance-based method whose
    * cost profile is exactly x30's broadcast-queries-scan-corpus shape;
    * per-point verdicts let an error analysis join back to features.
    *
    * Scale: test cohort broadcast, corpus scanned once, per-query top-k
    * via ranking window on the (small) candidate set — at 100 TB the scan
    * arm swaps for the IVF/PQ candidates (x34–x39) with the same
    * vote/eval tail. */
  def knnEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", $"label",
        Similarity.norm($"embedding").as("nrm"))
    val test = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"),
        $"nrm".as("qn"), $"label".as("true_label"))
    val train = emb.filter($"vec_id" % 50 =!= 0)
    val wTop = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val neigh = train.crossJoin(broadcast(test))
      .select($"q_id", $"true_label", $"vec_id", $"label",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter($"rk" <= 5)
    val wVote = Window.partitionBy($"q_id").orderBy($"votes".desc, $"label")
    neigh.groupBy($"q_id", $"true_label", $"label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter($"vr" === 1)
      .select($"q_id", $"true_label", $"label".as("pred_label"), $"votes".cast("int").as("votes"),
        ($"label" === $"true_label").cast("int").as("correct"))
      .orderBy("q_id")
  }

  private val knnEvalOracle =
    s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, label AS true_label
       |      FROM e WHERE vec_id % 50 = 0),
       |p AS (SELECT q_id, true_label, e.vec_id, e.label,
       |        round(${SimilarityQueries.cosineSql("qv", "e.embedding")}, 4) AS cosine
       |      FROM e JOIN q ON e.vec_id % 50 <> 0),
       |r AS (SELECT q_id, true_label, vec_id, label, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p),
       |v AS (SELECT q_id, true_label, label, count(*) AS votes
       |      FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
       |w AS (SELECT q_id, true_label, label, votes,
       |        row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS vr
       |      FROM v)
       |SELECT q_id, true_label, label AS pred_label,
       |       CAST(votes AS INTEGER) AS votes,
       |       CAST(label = true_label AS INTEGER) AS correct
       |FROM w WHERE vr = 1
       |ORDER BY q_id""".stripMargin

  /** q108: decimal-exact money aggregation parity — the type-surface
    * completion of the integer-cents convention: prices cast to
    * DECIMAL(18,2) sum EXACTLY in both engines (Spark widens to
    * DECIMAL(28,2), DuckDB to DECIMAL(38,2) — no float accumulation in
    * either), and the `decimal_matches_cents` flag proves the decimal sum
    * ×100 equals the independent BIGINT-cents sum, i.e. the decimal path
    * lost nothing. Outputs cast to DOUBLE/BIGINT because the decimal
    * TYPES differ across engines even when the values are identical (the
    * r9 HUGEINT lesson applied proactively); the averages re-derive from
    * the exact sums with one half-up rounding site.
    *
    * Scale: decimal sums are Tungsten-native partial aggregates — same
    * one-shuffle shape as any sum, exactness for free. */
  def decimalParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        $"l_extendedprice".cast("decimal(18,2)").as("dp"),
        floor($"l_extendedprice" * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"dp").as("dsum"),
        sum($"cents").as("csum"))
      .select($"l_returnflag", $"n",
        $"dsum".cast("double").as("sum_price"),
        $"csum".as("sum_cents"),
        (($"dsum" * 100).cast("long") === $"csum").cast("int").as("decimal_matches_cents"),
        QueryUtil.halfUp($"csum".cast("double") / 100.0 / $"n".cast("double"), 2)
          .as("avg_price"))
      .orderBy("l_returnflag")
  }

  private val decimalParityOracle =
    """SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |            = sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS INTEGER)
      |         AS decimal_matches_cents,
      |       floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |             / 100.0 / count(*) * 100 + 0.5) / 100.0 AS avg_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x169_knn_eval",
      "kNN majority-vote classifier eval: broadcast test cohort, top-5 train neighbors, deterministic vote, per-point verdicts",
      knnEval, Some(knnEvalOracle)),
    QueryDef("q108_decimal_parity",
      "DECIMAL(18,2) money sums are exact in both engines and equal the independent integer-cents sum",
      decimalParity, Some(decimalParityOracle)))
}
