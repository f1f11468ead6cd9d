package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-first tier: density-based outlier scoring over the
  * embedding corpus — Local Outlier Factor (x213), the neighbor-
  * relative density ratio that flags points whose local density is far
  * below their neighbors' (a global distance threshold can't see
  * cluster-relative outliers). */
object Round10Queries41 {

  /** Neighborhood size. */
  private val LofK = 5

  /** Published outliers (top LOF scores). */
  private val LofTop = 20

  /** x213: Local Outlier Factor, exactly: kNN for EVERY corpus vector
    * (squared L2 via the precomputed-norm identity ‖a‖²+‖b‖²−2a·b, the
    * x30 recipe), k-distance per point, reachability
    * rd(p,o) = max(kdist(o), d(p,o)) quantized to 1e-6 fixed point per
    * PAIR (so the k-element sums are order-free integer sums), local
    * reachability density lrd = k·10¹² div Σrd, and
    * LOF(p) = Σ_{o∈kNN(p)} lrd(o) / (k·lrd(p)) — every division an
    * integer div on positives. Publishes the [[LofTop]] highest
    * scores.
    *
    * Scale: the fixture corpus is small enough for the exact n² pass
    * (the documented brute baseline, like x30); at 100 TB the kNN
    * stage swaps for the x34 IVF or x31 sign-LSH candidate generation
    * while the LOF algebra downstream is unchanged — it only ever
    * touches the n·k neighbor table. */
  def lof(spark: SparkSession, dir: String): DataFrame = {
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
    // d² quantized to 1e-6 fixed point AT THE PAIR so the kNN ranking key
    // is an exact integer — which lets the r11 scale fix below use the
    // x192 bounded top-k aggregate instead of ranking n² rows through a
    // window (the sf1 sweep measured that shuffle as the scale killer:
    // 69 s at 20k vectors). topk_pairs(-d2_fp, b, k) ships ≤k pairs per
    // point per map task; the exchange is O(n·k), never O(n²). The n²·d
    // dot-product COMPUTE stays (exact kNN is quadratic by definition —
    // the subquadratic exponent lives in the x34/x31 candidate paths).
    val pairs = emb.toDF("a", "av", "na2")
      .join(broadcast(emb.toDF("b", "bv", "nb2")), $"a" =!= $"b")
      .select($"a", $"b",
        floor(($"na2" + $"nb2" - Similarity.dot($"av", $"bv") * 2) * 1e6 + 0.5)
          .cast("long").as("d2fp"))
    val knn = pairs.groupBy($"a")
      .agg(expr(s"topk_pairs(-d2fp, b, $LofK)").as("top"))
      .select($"a", posexplode($"top"))
      .select($"a", ($"pos" + 1).as("rk"), $"col.id".as("b"),
        (-$"col.v").as("d2fp"))
      .localCheckpoint(true)
    // kdist keyed by the POINT whose neighborhood it is: rk==K row of a.
    val kdistOf = knn.filter($"rk" === LofK).select($"a".as("o"), $"d2fp".as("kd2"))
    val reach = knn
      .join(kdistOf.toDF("b", "kd2_b"), "b")
      .select($"a", $"b",
        expr("greatest(CAST(floor(sqrt(greatest(kd2_b, d2fp) / 1000000.0)" +
          " * 1000000 + 0.5) AS BIGINT), CAST(1 AS BIGINT))").as("rd_fp"))
    val lrd = reach.groupBy($"a")
      .agg(sum($"rd_fp").as("srd"))
      .select($"a", expr(s"CAST($LofK AS BIGINT) * 1000000000000 div srd")
        .as("lrd_fp"))
      .localCheckpoint(true)
    val lofScores = knn
      .join(lrd.toDF("b", "lrd_o"), "b")
      .groupBy($"a").agg(sum($"lrd_o").as("slrd"))
      .join(lrd.toDF("a", "lrd_p"), "a")
      .select($"a".as("vec_id"),
        expr(s"(slrd * 1000000) div ($LofK * lrd_p)").as("lof_fp"))
    lofScores
      .withColumn("rk", row_number().over(
        Window.orderBy($"lof_fp".desc, $"vec_id")).cast("long"))
      .filter($"rk" <= LofTop)
      .select($"rk", $"vec_id", $"lof_fp")
      .orderBy($"rk")
  }

  private val lofOracle = {
    val dot = "list_sum(list_transform(range(1, len(e1.embedding) + 1)," +
      " i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))"
    s"""WITH norms AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |         list_sum(list_transform(range(1, len(embedding) + 1),
       |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
       |           AS n2
       |  FROM embeddings),
       |pairs AS MATERIALIZED (
       |  SELECT e1.vec_id AS a, e2.vec_id AS b,
       |         CAST(floor((e1.n2 + e2.n2 - $dot * 2) * 1000000 + 0.5)
       |              AS BIGINT) AS d2fp
       |  FROM norms e1 JOIN norms e2 ON e1.vec_id <> e2.vec_id),
       |knn AS MATERIALIZED (
       |  SELECT a, b, d2fp, rk FROM (
       |    SELECT a, b, d2fp,
       |           row_number() OVER (PARTITION BY a ORDER BY d2fp, b) AS rk
       |    FROM pairs) t
       |  WHERE rk <= $LofK),
       |kdist_of AS MATERIALIZED (
       |  SELECT a AS o, d2fp AS kd2 FROM knn WHERE rk = $LofK),
       |reach AS (
       |  SELECT k.a, k.b,
       |         greatest(CAST(floor(sqrt(greatest(kd.kd2, k.d2fp) / 1000000.0)
       |              * 1000000 + 0.5) AS BIGINT), 1) AS rd_fp
       |  FROM knn k JOIN kdist_of kd ON kd.o = k.b),
       |lrd AS MATERIALIZED (
       |  SELECT a, CAST($LofK * 1000000000000 // sum(rd_fp) AS BIGINT) AS lrd_fp
       |  FROM reach GROUP BY a),
       |scores AS (
       |  SELECT k.a AS vec_id,
       |         CAST(sum(lo.lrd_fp) * 1000000 // ($LofK * max(lp.lrd_fp))
       |              AS BIGINT) AS lof_fp
       |  FROM knn k
       |  JOIN lrd lo ON lo.a = k.b
       |  JOIN lrd lp ON lp.a = k.a
       |  GROUP BY k.a)
       |SELECT rk, vec_id, lof_fp FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY lof_fp DESC, vec_id)
       |              AS BIGINT) AS rk, vec_id, lof_fp
       |  FROM scores) t
       |WHERE rk <= $LofTop
       |ORDER BY rk""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x213_lof",
      "Local Outlier Factor over embeddings: exact kNN, pair-quantized reachability, integer lrd and LOF ratios, top-20 outliers",
      lof, Some(lofOracle)))
}
