package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 twentieth tier: k-center greedy coreset selection — the
  * diversity-sampling method (farthest-point traversal) a data-curation
  * pipeline uses to pick a small representative subset of a corpus. */
object Round10Queries20 {

  /** Candidate pool bound (vec_id % 10 = 0) and rounds (seed + 4). */
  private val PoolMod = 10

  /** x177: k-center greedy coreset — farthest-point traversal (the 2-OPT
    * approximation to k-center): seed with the smallest id, then four
    * times add the pool point FARTHEST from the selected set (cosine
    * distance, argmax ties toward the smaller id). The greedy recursion
    * is unrolled round by round (the x82 MMR discipline), each round one
    * broadcast of the single new center + a `least` fold of the running
    * min-distance — selection keys stay UNROUNDED doubles computed in
    * identical op order in both engines (the r6 ranking-key rule);
    * distances quantize half-up only for display. Emits the 5 centers in
    * selection order with their selection distances, plus each round's
    * coverage radius (the selection distance IS the k-center objective).
    *
    * Scale: one pairwise-sim stage over the pool (pool is a hash-bounded
    * sample, not the corpus), then O(k) broadcast rounds — the standard
    * coreset recipe; at 100 TB the pool comes from a q36-style hash
    * sample and the same unrolled plan applies. */
  def kcenterCoreset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pool = Tables.embeddings(spark, dir)
      .filter($"vec_id" % PoolMod === 0)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
      .localCheckpoint(true) // both sim sides + every round's pool scan
    val sim = pool.select($"vec_id".as("a"), $"embedding".as("av"), $"nrm".as("an"))
      .join(pool.select($"vec_id".as("b"), $"embedding".as("bv"), $"nrm".as("bn")))
      .filter($"a" =!= $"b")
      .select($"a", $"b",
        (lit(1.0) - Similarity.dot($"av", $"bv") / ($"an" * $"bn")).as("d"))
      .localCheckpoint(true) // re-joined every round
    val ids = pool.select($"vec_id")
    def argmaxD(df: DataFrame): DataFrame = {
      val w = Window.orderBy($"dmin".desc, $"vec_id")
      df.withColumn("arn", row_number().over(w)).filter($"arn" === 1).drop("arn")
    }
    // seed: smallest id, selection distance undefined (0)
    val s1 = ids.orderBy($"vec_id").limit(1)
      .select($"vec_id", lit(0.0).as("dmin"))
    def dTo(center: DataFrame): DataFrame =
      ids.crossJoin(broadcast(center.select($"vec_id".as("c"))))
        .filter($"vec_id" =!= $"c")
        .join(sim, $"vec_id" === $"a" && $"c" === $"b")
        .select($"vec_id", $"d")
    // round 2: distance to the seed
    val d1 = dTo(s1).select($"vec_id", $"d".as("dmin"))
    val s2 = argmaxD(d1)
    // rounds 3..5: fold the new center's distance into the running min
    def round(prev: DataFrame, sel: DataFrame): (DataFrame, DataFrame) = {
      val dNew = dTo(sel).select($"vec_id", $"d".as("dnew"))
      val dm = prev.join(dNew, "vec_id") // the new center drops out (no self row)
        .select($"vec_id", least($"dmin", $"dnew").as("dmin"))
      (dm, argmaxD(dm))
    }
    val (d2, s3) = round(d1, s2)
    val (d3, s4) = round(d2, s3)
    val (_, s5) = round(d3, s4)
    s1.select(lit(1).as("rk"), $"vec_id", $"dmin")
      .unionByName(s2.select(lit(2).as("rk"), $"vec_id", $"dmin"))
      .unionByName(s3.select(lit(3).as("rk"), $"vec_id", $"dmin"))
      .unionByName(s4.select(lit(4).as("rk"), $"vec_id", $"dmin"))
      .unionByName(s5.select(lit(5).as("rk"), $"vec_id", $"dmin"))
      .select($"rk", $"vec_id", QueryUtil.halfUp4($"dmin").as("sel_dist"))
      .orderBy("rk")
  }

  private val kcenterCoresetOracle = {
    val cos = SimilarityQueries.cosineSql("p.embedding", "c.embedding")
    s"""WITH pool AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % $PoolMod = 0),
       |s1 AS (SELECT min(vec_id) AS c1 FROM pool),
       |d1 AS MATERIALIZED (
       |  SELECT p.vec_id, 1.0 - $cos AS dmin
       |  FROM pool p JOIN pool c ON c.vec_id = (SELECT c1 FROM s1)
       |  WHERE p.vec_id <> (SELECT c1 FROM s1)),
       |s2 AS (SELECT vec_id AS c2, dmin FROM d1
       |       ORDER BY dmin DESC, vec_id LIMIT 1),
       |d2 AS MATERIALIZED (
       |  SELECT p.vec_id, least(d1.dmin, 1.0 - $cos) AS dmin
       |  FROM pool p
       |  JOIN d1 ON d1.vec_id = p.vec_id
       |  JOIN pool c ON c.vec_id = (SELECT c2 FROM s2)
       |  WHERE p.vec_id <> (SELECT c2 FROM s2)),
       |s3 AS (SELECT vec_id AS c3, dmin FROM d2
       |       ORDER BY dmin DESC, vec_id LIMIT 1),
       |d3 AS MATERIALIZED (
       |  SELECT p.vec_id, least(d2.dmin, 1.0 - $cos) AS dmin
       |  FROM pool p
       |  JOIN d2 ON d2.vec_id = p.vec_id
       |  JOIN pool c ON c.vec_id = (SELECT c3 FROM s3)
       |  WHERE p.vec_id <> (SELECT c3 FROM s3)),
       |s4 AS (SELECT vec_id AS c4, dmin FROM d3
       |       ORDER BY dmin DESC, vec_id LIMIT 1),
       |d4 AS MATERIALIZED (
       |  SELECT p.vec_id, least(d3.dmin, 1.0 - $cos) AS dmin
       |  FROM pool p
       |  JOIN d3 ON d3.vec_id = p.vec_id
       |  JOIN pool c ON c.vec_id = (SELECT c4 FROM s4)
       |  WHERE p.vec_id <> (SELECT c4 FROM s4)),
       |s5 AS (SELECT vec_id AS c5, dmin FROM d4
       |       ORDER BY dmin DESC, vec_id LIMIT 1)
       |SELECT rk, vec_id, floor(dmin * 10000 + 0.5) / 10000.0 AS sel_dist
       |FROM (
       |  SELECT 1 AS rk, (SELECT c1 FROM s1) AS vec_id, 0.0 AS dmin
       |  UNION ALL SELECT 2, c2, dmin FROM s2
       |  UNION ALL SELECT 3, c3, dmin FROM s3
       |  UNION ALL SELECT 4, c4, dmin FROM s4
       |  UNION ALL SELECT 5, c5, dmin FROM s5)
       |ORDER BY rk""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x177_kcenter_coreset",
      "k-center greedy coreset: farthest-point traversal, 4 unrolled rounds, unrounded selection keys, coverage radii",
      kcenterCoreset, Some(kcenterCoresetOracle)))
}
