package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.QueryUtil.halfUp4

/** The capstone composite: the full training-data preparation pipeline a
  * 100 TB corpus runs before pretraining, end to end in ONE dataflow —
  *
  *   1. quality gate (x42's score >= 0.5),
  *   2. exact dedup survivors (x10's min-doc_id-per-content-hash),
  *   3. near-dup canonical docs only (x14's connected-component
  *      representative over MinHash-LSH pairs),
  *
  * emitting the surviving documents with language and token counts. Each
  * stage is the already-oracle-verified operator; this query proves they
  * COMPOSE — the oracle rebuilds the same three gates in one SQL statement
  * (recursive-CTE transitive closure for the clusters, window dedup for
  * exact, identical quality arithmetic) and must agree row-for-row.
  *
  * Scale: quality is a narrow per-row stage; the dedup gates are the
  * LSH/band-capped shapes audited in PLANS.md; the final joins are
  * doc_id equi-joins (broadcast-able survivor lists at any realistic
  * survivor ratio). */
object PipelineQueries {

  def prepPipeline(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val toks = TextAnalysis.tokens($"text")
    val scored = Tables.documents(spark, dir).select(
      $"doc_id", $"lang", size(toks).as("n_tok"),
      halfUp4(TextAnalysis.qualityScore(toks)).as("quality"))
    val exactSurvivors = DedupQueries.exactDedup(spark, dir).select($"doc_id")
    val canonical = DedupQueries.dedupClusters(spark, dir)
      .filter($"is_canonical" === 1).select($"doc_id")
    scored.filter($"quality" >= 0.5)
      .join(exactSurvivors, "doc_id")
      .join(canonical, "doc_id")
      .orderBy("doc_id")
  }

  private val prepOracle =
    DedupQueries.minhashCtes("WITH RECURSIVE") +
      s""", pairs2 AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT a AS src, b AS dst FROM pairs2 UNION ALL SELECT b AS src, a AS dst FROM pairs2),
         |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
         |          UNION
         |          SELECT e.src AS id, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.id),
         |canon AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id),
         |exact AS (SELECT doc_id
         |          FROM (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |                FROM documents)
         |          WHERE rn = 1),
         |q AS (SELECT doc_id, lang,
         |        CAST(len(toks) AS INTEGER) AS n_tok,
         |        floor(${TextAnalysis.qualityScoreSql("toks")} * 10000 + 0.5) / 10000.0 AS quality
         |      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))
         |SELECT q.doc_id, lang, n_tok, quality
         |FROM q JOIN canon ON canon.doc_id = q.doc_id
         |       JOIN exact ON exact.doc_id = q.doc_id
         |WHERE quality >= 0.5
         |ORDER BY q.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x90_prep_pipeline",
      "composite corpus-prep pipeline: quality gate + exact dedup + near-dup canonical (X1+X2+X4)",
      prepPipeline, Some(prepOracle)))
}
