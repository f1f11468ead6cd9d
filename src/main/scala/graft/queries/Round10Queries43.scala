package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-third tier: hubness in high-dimensional retrieval —
  * the k-occurrence audit that measures it (x217) and CSLS reranking
  * that corrects for it (x216). */
object Round10Queries43 {

  /** Neighborhood size for the local-scaling means and the audit. */
  private val CslsK = 10

  /** Published depth per query. */
  private val CslsTop = 5

  /** Shared SQL: per-pair cosine in 1e-6 fixed point. */
  private def cosFpSql(dot: String) =
    s"CAST(floor($dot / (sqrt(n2a) * sqrt(n2b)) * 1000000 + 0.5) AS BIGINT)"

  /** x216: CSLS (cross-domain similarity local scaling) top-k — the
    * hubness correction from the bilingual-embedding literature:
    * score(a,b) = 2·cos(a,b) − r(a) − r(b), where r(x) is the mean
    * cosine of x's [[CslsK]] nearest neighbors. Hubs (points that are
    * everyone's neighbor) carry a high r penalty, so they stop
    * crowding every result list — the failure mode plain x30 cosine
    * has in high dimensions. All cosines quantize to 1e-6 per pair;
    * r is an integer div mean; the CSLS key is an exact integer, so
    * the ranking is engine-stable by construction.
    *
    * Scale: the r table is the x213 kNN pass (brute here, IVF/LSH
    * candidates at scale); the query rerank touches |queries|×n pairs
    * with the query side broadcast. */
  def cslsTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        Similarity.dot($"embedding", $"embedding").as("n2"))
      // stream-side parallelism for the n x n pair stage: the embedding
      // table is tiny ON DISK (KB-scale parquet -> ONE scan partition) but
      // the nested-loop join fans each stream row out n ways — without
      // this the whole quadratic stage runs on <= a few cores (measured
      // on the r11 sf1 sweep)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    // r11 scale fix (sf1 sweep): the integer cos_fp ranking key lets BOTH
    // rank stages run as the x192 bounded top-k AGGREGATE — map tasks
    // ship ≤k pairs per point, so no n²-row window shuffle anywhere; the
    // result order (cos_fp DESC, b ASC) is exactly the old window's.
    val pairs = emb.toDF("a", "av", "n2a")
      .join(broadcast(emb.toDF("b", "bv", "n2b")), $"a" =!= $"b")
      .select($"a", $"b",
        expr(cosFpSql("vec_dot(av, bv)")).as("cos_fp"))
    val knn = pairs.groupBy($"a")
      .agg(expr(s"topk_pairs(cos_fp, b, $CslsK)").as("top"))
      .select($"a", explode($"top").as("p"))
      .select($"a", $"p.id".as("b"), $"p.v".as("cos_fp"))
    val r = knn.groupBy($"a")
      .agg(expr("sum(cos_fp) div count(1)").as("r_fp"))
      .localCheckpoint(true)
    val q = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"n2".as("n2a"))
    val scored = emb.toDF("b", "bv", "n2b")
      .join(broadcast(q), $"b" =!= $"qid")
      .select($"qid", $"b", expr(cosFpSql("vec_dot(qv, bv)")).as("cos_fp"))
      .join(broadcast(r.toDF("qid", "r_q")), "qid")
      .join(r.toDF("b", "r_b"), "b")
      .select($"qid", $"b",
        ($"cos_fp" * 2 - $"r_q" - $"r_b").as("csls_fp"))
    // cos_fp re-derives exactly from the integer identity
    // csls = 2·cos − r_q − r_b (the sum is even by construction).
    scored.groupBy($"qid")
      .agg(expr(s"topk_pairs(csls_fp, b, $CslsTop)").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", ($"pos" + 1).cast("long").as("rk"),
        $"col.id".as("vec_id"), $"col.v".as("csls_fp"))
      .join(broadcast(r.toDF("qid", "r_q")), "qid")
      .join(r.toDF("vec_id", "r_b"), "vec_id")
      .select($"qid", $"rk", $"vec_id", $"csls_fp",
        expr("(csls_fp + r_q + r_b) div 2").as("cos_fp"))
      .orderBy($"qid", $"rk")
  }

  private def oracleCos(a: String, b: String) =
    s"""CAST(floor(list_sum(list_transform(range(1, len($a.embedding) + 1),
       |    i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
       |  / (sqrt($a.n2) * sqrt($b.n2)) * 1000000 + 0.5) AS BIGINT)""".stripMargin

  private val normsCte =
    """norms AS MATERIALIZED (
      |  SELECT vec_id, embedding,
      |         list_sum(list_transform(range(1, len(embedding) + 1),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |           AS n2
      |  FROM embeddings)""".stripMargin

  private val cslsOracle =
    s"""WITH $normsCte,
       |pairs AS MATERIALIZED (
       |  SELECT e1.vec_id AS a, e2.vec_id AS b,
       |         ${oracleCos("e1", "e2")} AS cos_fp
       |  FROM norms e1 JOIN norms e2 ON e1.vec_id <> e2.vec_id),
       |knn AS (
       |  SELECT a, b, cos_fp,
       |         row_number() OVER (PARTITION BY a ORDER BY cos_fp DESC, b) AS rk
       |  FROM pairs),
       |r AS MATERIALIZED (
       |  SELECT a, CAST(sum(cos_fp) // count(*) AS BIGINT) AS r_fp
       |  FROM knn WHERE rk <= $CslsK GROUP BY a),
       |scored AS (
       |  SELECT p.a AS qid, p.b,
       |         CAST(p.cos_fp * 2 - rq.r_fp - rb.r_fp AS BIGINT) AS csls_fp,
       |         p.cos_fp
       |  FROM pairs p
       |  JOIN r rq ON rq.a = p.a JOIN r rb ON rb.a = p.b
       |  WHERE p.a % 50 = 0)
       |SELECT qid, rk, vec_id, csls_fp, cos_fp FROM (
       |  SELECT qid, b AS vec_id, csls_fp, cos_fp,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY csls_fp DESC, b) AS BIGINT) AS rk
       |  FROM scored) t
       |WHERE rk <= $CslsTop
       |ORDER BY qid, rk""".stripMargin

  /** x217: hubness audit — the k-occurrence distribution N_k (how many
    * top-[[CslsK]] lists each vector appears in). In high dimensions
    * N_k grows right-skewed: a few hubs dominate while antihubs vanish
    * from every list — the effect x216 corrects. Publishes the top
    * hubs plus the replicated distribution panel: antihub count,
    * max N_k, and the moment skewness of N_k (integer moments, one
    * IEEE sqrt).
    *
    * Scale: one n·k aggregation over the kNN table; the distribution
    * is corpus-rows-sized with a constant-width output. */
  def hubnessAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        Similarity.dot($"embedding", $"embedding").as("n2"))
      // stream-side parallelism for the n x n pair stage: the embedding
      // table is tiny ON DISK (KB-scale parquet -> ONE scan partition) but
      // the nested-loop join fans each stream row out n ways — without
      // this the whole quadratic stage runs on <= a few cores (measured
      // on the r11 sf1 sweep)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    // r11 scale fix: bounded top-k aggregate instead of the n²-row window
    // (see cslsTopk above — same shape, same result order).
    val pairs = emb.toDF("a", "av", "n2a")
      .join(broadcast(emb.toDF("b", "bv", "n2b")), $"a" =!= $"b")
      .select($"a", $"b",
        expr(cosFpSql("vec_dot(av, bv)")).as("cos_fp"))
    val knn = pairs.groupBy($"a")
      .agg(expr(s"topk_pairs(cos_fp, b, $CslsK)").as("top"))
      .select($"a", explode($"top").as("p"))
      .select($"a", $"p.id".as("b"))
    val nk = emb.select($"vec_id")
      .join(knn.groupBy($"b").agg(count(lit(1)).as("k_occ")),
        $"vec_id" === $"b", "left")
      .select($"vec_id", coalesce($"k_occ", lit(0L)).as("k_occ"))
      .localCheckpoint(true)
    val mom = nk.agg(count(lit(1)).as("n"), sum($"k_occ").as("s1"),
      sum($"k_occ" * $"k_occ").as("s2"),
      sum($"k_occ" * $"k_occ" * $"k_occ").as("s3"),
      sum(when($"k_occ" === 0L, 1L).otherwise(0L)).as("n_antihubs"),
      max($"k_occ").as("max_k_occ"))
    val panel = mom.select($"n_antihubs", $"max_k_occ",
      // Skewness = (m3) / m2^1.5 with central moments from raw sums,
      // one spelled-out double formula (mean = s1/n etc.).
      expr("CAST(floor((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)" +
        " - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))" +
        " / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)" +
        " - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))" +
        " * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)" +
        " - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))" +
        " * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))" +
        " * 10000 + 0.5) AS BIGINT)").as("skew_fp4"))
    nk.withColumn("rk", row_number().over(
      Window.orderBy($"k_occ".desc, $"vec_id")).cast("long"))
      .filter($"rk" <= 10)
      .crossJoin(broadcast(panel))
      .select($"rk", $"vec_id", $"k_occ", $"n_antihubs", $"max_k_occ",
        $"skew_fp4")
      .orderBy($"rk")
  }

  private val hubnessOracle =
    s"""WITH $normsCte,
       |pairs AS MATERIALIZED (
       |  SELECT e1.vec_id AS a, e2.vec_id AS b,
       |         ${oracleCos("e1", "e2")} AS cos_fp
       |  FROM norms e1 JOIN norms e2 ON e1.vec_id <> e2.vec_id),
       |knn AS (
       |  SELECT a, b FROM (
       |    SELECT a, b,
       |           row_number() OVER (PARTITION BY a ORDER BY cos_fp DESC, b) AS rk
       |    FROM pairs) t
       |  WHERE rk <= $CslsK),
       |nk AS MATERIALIZED (
       |  SELECT n0.vec_id, CAST(COALESCE(k.k_occ, 0) AS BIGINT) AS k_occ
       |  FROM norms n0 LEFT JOIN (
       |    SELECT b, CAST(count(*) AS BIGINT) AS k_occ FROM knn GROUP BY b) k
       |  ON k.b = n0.vec_id),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k_occ) AS BIGINT) AS s1,
       |         CAST(sum(k_occ * k_occ) AS BIGINT) AS s2,
       |         CAST(sum(k_occ * k_occ * k_occ) AS BIGINT) AS s3,
       |         CAST(sum(CASE WHEN k_occ = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_antihubs,
       |         CAST(max(k_occ) AS BIGINT) AS max_k_occ
       |  FROM nk),
       |panel AS (
       |  SELECT n_antihubs, max_k_occ,
       |         CAST(floor((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |           - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |           + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       |           / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       |           * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
       |           * 10000 + 0.5) AS BIGINT) AS skew_fp4
       |  FROM mom)
       |SELECT rk, vec_id, k_occ, n_antihubs, max_k_occ, skew_fp4 FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY k_occ DESC, vec_id)
       |              AS BIGINT) AS rk, vec_id, k_occ
       |  FROM nk) t, panel
       |WHERE rk <= 10
       |ORDER BY rk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x216_csls_topk",
      "CSLS hubness-corrected retrieval: 2cos - r(a) - r(b) with integer local-scaling means, top-5 per query",
      cslsTopk, Some(cslsOracle)),
    QueryDef("x217_hubness_audit",
      "k-occurrence hubness audit: top hubs, antihub count, and moment skewness of N_k over the kNN lists",
      hubnessAudit, Some(hubnessOracle)))
}
