package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 sixteenth tier: retrieval-arm comparison — the evaluation
  * harness that closes the loop between the retrieval family (dense x30,
  * sparse x80, hybrid x81) and the eval family (x83 MRR): all three arms
  * scored on one ground truth in one query. */
object Round10Queries16 {

  /** x170: fusion A/B evaluation — MRR@3 and hits@3 for the dense, BM25,
    * and RRF-fused rankings on the SAME query cohort (the %100 query docs
    * that carry an embedding label) with label agreement as relevance.
    * Reciprocal ranks are exact integer rationals (10⁶ div rank — the x83
    * convention), so per-arm sums are order-free; candidates without an
    * embedding label (possible: the document table outgrows the embedding
    * table at sf0.1) count as non-relevant in both engines. This is the
    * measurement that justifies (or kills) the fusion layer: it must beat
    * the better single arm to earn its cost.
    *
    * Scale: each arm keeps its own audited plan (broadcast queries /
    * inverted index / rank-pair fusion); the eval tail touches only
    * K·|queries| rows per arm. */
  def fusionEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lab = Tables.embeddings(spark, dir).select($"vec_id", $"label")
    val qlab = lab.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"label".as("qlab"))
    def armMrr(name: String, list: DataFrame) =
      list.filter($"rk" <= 3)
        .join(broadcast(qlab), "q_id")
        .join(lab.select($"vec_id".as("id"), $"label".as("clab")), Seq("id"), "left")
        .groupBy($"q_id")
        .agg(min(when($"clab" === $"qlab", $"rk")).as("fr"))
        .agg(count(lit(1)).as("n_q"),
          sum(when($"fr".isNotNull, 1L).otherwise(0L)).as("hits3"),
          sum(when($"fr".isNotNull, expr("1000000 div fr")).otherwise(0L)).as("mrr_fp"))
        .select(lit(name).as("arm"), $"n_q", $"hits3", $"mrr_fp",
          QueryUtil.halfUp4($"mrr_fp".cast("double") / 1e6 / $"n_q".cast("double"))
            .as("mrr"))
    val dense = SimilarityQueries.cosineTopK(spark, dir)
      .select($"q_id", $"vec_id".as("id"), $"rk")
    val sparse = RetrievalQueries.bm25TopK(spark, dir)
      .select($"q_id", $"doc_id".as("id"), $"rk")
    val fused = RetrievalQueries.rrfFusion(spark, dir)
      .select($"q_id", $"id", $"rk")
    armMrr("bm25", sparse)
      .unionByName(armMrr("dense", dense))
      .unionByName(armMrr("rrf", fused))
      .orderBy("arm")
  }

  private val fusionEvalOracle = {
    val denseCte =
      s"""e AS (SELECT vec_id, embedding,
         |       sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
         |            i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |     FROM embeddings),
         |dq AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM e WHERE vec_id % 100 = 0),
         |dp AS (SELECT q_id, e.vec_id AS id,
         |        round(list_sum(list_transform(range(1, len(qv) + 1),
         |              i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) / (qn * e.nrm), 4) AS cosine
         |      FROM e JOIN dq ON e.vec_id <> dq.q_id),
         |dr AS (SELECT q_id, id,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, id) AS drk
         |      FROM dp)""".stripMargin
    s"""WITH ${RetrievalQueries.bm25Ctes},
       |$denseCte,
       |dense5 AS (SELECT q_id, id, drk FROM dr WHERE drk <= ${RetrievalQueries.TopK}),
       |sparse5 AS (SELECT q_id, doc_id AS id, rk AS srk FROM bmr
       |            WHERE rk <= ${RetrievalQueries.TopK}),
       |fused AS (SELECT coalesce(dense5.q_id, sparse5.q_id) AS q_id,
       |            coalesce(dense5.id, sparse5.id) AS id,
       |            coalesce(1.0 / (${RetrievalQueries.RrfK} + drk), 0.0)
       |              + coalesce(1.0 / (${RetrievalQueries.RrfK} + srk), 0.0) AS rrf
       |          FROM dense5 FULL OUTER JOIN sparse5
       |            ON dense5.q_id = sparse5.q_id AND dense5.id = sparse5.id),
       |fr3 AS (SELECT q_id, id, rk FROM (
       |          SELECT q_id, id, row_number() OVER (PARTITION BY q_id
       |                   ORDER BY rrf DESC, id) AS rk
       |          FROM fused) WHERE rk <= 3),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |qlab AS (SELECT vec_id AS q_id, label AS qlab FROM lab WHERE vec_id % 100 = 0),
       |arms AS (
       |  SELECT 'dense' AS arm, q_id, id, drk AS rk FROM dense5 WHERE drk <= 3
       |  UNION ALL
       |  SELECT 'bm25', q_id, id, srk FROM sparse5 WHERE srk <= 3
       |  UNION ALL
       |  SELECT 'rrf', q_id, id, rk FROM fr3),
       |per_q AS (
       |  SELECT a.arm, a.q_id,
       |         min(CASE WHEN c.label = q.qlab THEN a.rk END) AS fr
       |  FROM arms a
       |  JOIN qlab q ON a.q_id = q.q_id
       |  LEFT JOIN lab c ON a.id = c.vec_id
       |  GROUP BY a.arm, a.q_id)
       |SELECT arm,
       |       CAST(count(*) AS BIGINT) AS n_q,
       |       CAST(sum(CASE WHEN fr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
       |       CAST(sum(CASE WHEN fr IS NOT NULL THEN 1000000 // fr ELSE 0 END) AS BIGINT) AS mrr_fp,
       |       floor(CAST(sum(CASE WHEN fr IS NOT NULL THEN 1000000 // fr ELSE 0 END) AS DOUBLE)
       |             / 1e6 / count(*) * 10000 + 0.5) / 10000.0 AS mrr
       |FROM per_q
       |GROUP BY arm
       |ORDER BY arm""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x170_fusion_eval",
      "retrieval-arm comparison: MRR@3 / hits@3 for dense, BM25, and RRF on one labeled query cohort",
      fusionEval, Some(fusionEvalOracle)))
}
