package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity coverage over `embeddings` (north star X3): brute-force
  * cosine top-k, sign-LSH bucketed ANN, embedding near-dup pairs, and array
  * scalar ops. Embeddings are 64-dim unit vectors (norm ≈ 1), but cosine is
  * always computed with the full dot/(|a||b|) formula. */
object SimilarityQueries {

  /** DuckDB rendering of Similarity.cosine for vectors `$a.embedding` vs
    * `$b`: element-wise double cast, sequential sum, full normalization. */
  private[queries] def cosineSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |    * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  /** X3 baseline: brute-force cosine top-5 for each query vector
    * (vec_id % 100 = 0). The query set is broadcast; the corpus is scanned
    * once with no shuffle; per-query top-k via ranking window on the (small)
    * pair set. 100 TB: identical plan — broadcast queries, scan corpus,
    * partial top-k per partition via TakeOrdered semantics. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Norms are precomputed per row BEFORE the pair join (identical doubles
    // to computing them per pair — sqrt of the same vec_dot(v,v) sum).
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    emb.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .orderBy("q_id", "rk")
  }

  private val cosineTopKOracle =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |p AS (SELECT q_id, e.vec_id AS vec_id,
       |        round(${cosineSql("qv", "e.embedding")}, 4) AS cosine
       |      FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p)
       |SELECT q_id, rk, vec_id, cosine FROM r
       |WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  /** X3 scale path: sign-projection LSH — candidates share an 8-bit
    * hyperoctant bucket, top-3 within bucket. Trades recall for a candidate
    * set ~1/256 of the corpus per query. */
  def signLshTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.signBucket($"embedding", 8).as("bkt"),
        Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"bkt", $"nrm".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    emb.join(broadcast(q), Seq("bkt")).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .orderBy("q_id", "rk")
  }

  private def bucketSql(v: String, bits: Int = 8): String =
    (1 to bits).map(i => s"CASE WHEN $v[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  private val ProbeBits = 8

  /** X3: MULTI-PROBE sign-LSH — each query searches its own hyperoctant
    * PLUS the 8 Hamming-distance-1 buckets (one sign bit flipped). A true
    * neighbor that disagrees with the query on exactly one of the 8
    * projected signs — the dominant miss mode of single-bucket LSH — is
    * recovered, at ~9/256 of the corpus per query instead of 1/256 (probe
    * buckets are distinct, so no candidate dedup is needed). Same join
    * shape as x31: probes broadcast, banded equi-join, per-query top-k.
    * Measured recall vs x30 exact is in PLANS.md. */
  def multiProbeLshTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        Similarity.signBucket($"embedding", ProbeBits).as("bkt"),
        Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"bkt", $"nrm".as("qn"))
    val probes = probeSet(q)
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    emb.join(broadcast(probes), $"bkt" === $"pbkt").filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .orderBy("q_id", "rk")
  }

  /** The base bucket + its 8 Hamming-1 flips per query — x36's probe set,
    * extracted so x119 mines hard negatives from the SAME audited pool.
    * Probe buckets are pairwise distinct, so a corpus vector (living in
    * exactly one bucket) can match a query at most once — no dedup. */
  private def probeSet(q: DataFrame): DataFrame = {
    val flips = (1 to ProbeBits).map { i =>
      concat(
        substring(col("bkt"), 1, i - 1),
        when(substring(col("bkt"), i, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("bkt"), i + 1, ProbeBits - i))
    }
    q.select(col("q_id"), col("qv"), col("qn"),
      explode(array((col("bkt") +: flips): _*)).as("pbkt"))
  }

  private val multiProbeOracle = {
    val flipSelects = (1 to ProbeBits).map(i =>
      s"""SELECT q_id, qv, qn, substr(bkt, 1, ${i - 1}) || (CASE WHEN substr(bkt, $i, 1) = '1' THEN '0' ELSE '1' END) || substr(bkt, ${i + 1}, ${ProbeBits - i}) AS pbkt FROM q""")
      .mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", ProbeBits)} AS bkt,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bkt FROM e WHERE vec_id % 25 = 0),
       |probes AS (
       |       SELECT q_id, qv, qn, bkt AS pbkt FROM q
       |       UNION ALL $flipSelects),
       |p AS (SELECT probes.q_id, e.vec_id,
       |        round(${dotSql("probes.qv", "e.embedding")} / (probes.qn * e.nrm), 4) AS cosine
       |      FROM e JOIN probes ON e.bkt = probes.pbkt AND e.vec_id <> probes.q_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p)
       |SELECT q_id, rk, vec_id, cosine FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin
  }

  private val signLshOracle =
    s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bkt FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, bkt FROM e WHERE vec_id % 25 = 0),
       |p AS (SELECT q.q_id, e.vec_id AS vec_id,
       |        round(${cosineSql("q.qv", "e.embedding")}, 4) AS cosine
       |      FROM e JOIN q ON e.bkt = q.bkt AND e.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p)
       |SELECT q_id, rk, vec_id, cosine FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin

  /** x32 banding: 8 bands × 4 sign bits over dims 1..32. A pair collides
    * when any band's 4 signs all agree. At a realistic near-dup threshold
    * (cos 0.9) recall is ≥ 99.8% with 1/16 per-band candidate fraction; at
    * this fixture's deliberately weak 0.45 threshold (near-uniform vectors,
    * sign-agreement prob per dim only ~0.65) measured recall is 11/14
    * (sf0.01) / 110/144 (sf0.1) with ~2× pair pruning — the price of ANY
    * blocking when the similarity gap is weak. */
  private val NearDupBands = 8
  private val NearDupRowsPerBand = 4

  /** X2/X3: embedding near-dup pairs — cosine >= 0.45 among banded sign-LSH
    * candidates. The pair join is a shuffle equi-join on (band, 4-sign-bit
    * key) with the shared skew cap, NOT an O(n²) BroadcastNestedLoopJoin —
    * the join shape that survives 100 TB. The oracle reproduces the
    * identical banding, so both engines see the same candidate set. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(spark, dir).orderBy("a", "b")

  /** x32's verified pair set without the driver-facing ORDER BY — the
    * reusable core (x119 anti-joins it as the false-positive guard). */
  private def embeddingNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"),
        Similarity.signBucket($"embedding", NearDupBands * NearDupRowsPerBand).as("sb"))
    val banded = emb.select($"vec_id",
      posexplode(array((0 until NearDupBands).map(t =>
        substring($"sb", t * NearDupRowsPerBand + 1, NearDupRowsPerBand)): _*))
        .as(Seq("band", "bh")))
    val cand = graft.operators.Dedup.bandSelfJoin(banded, "vec_id",
      graft.operators.Dedup.DefaultMaxBucket)
    // fence: keep the 64-dim vec_dot from being re-inlined into the
    // pushed-down threshold filter (would double the per-pair cost).
    cand
      .join(emb.select($"vec_id".as("a"), $"embedding".as("va"), $"nrm".as("na")), "a")
      .join(emb.select($"vec_id".as("b"), $"embedding".as("vb"), $"nrm".as("nb")), "b")
      .select($"a", $"b", QueryUtil.fence(
        round(Similarity.dot($"va", $"vb") / ($"na" * $"nb"), 4)).as("cosine"))
      .filter($"cosine" >= 0.45)
  }

  private val nearDupOracle = {
    val bands = (0 until NearDupBands).map(t =>
      s"SELECT vec_id, $t AS band, substr(sb, ${t * NearDupRowsPerBand + 1}, $NearDupRowsPerBand) AS bh FROM e")
      .mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketSql("embedding", NearDupBands * NearDupRowsPerBand)} AS sb
       |           FROM embeddings),
       |bands AS (
       |       $bands),
       |bands_pruned AS (SELECT vec_id, band, bh
       |                 FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS bn FROM bands)
       |                 WHERE bn <= ${graft.operators.Dedup.DefaultMaxBucket}),
       |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |         FROM bands_pruned x JOIN bands_pruned y
       |           ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id),
       |p AS (SELECT a, b,
       |        round(${cosineSql("ea.embedding", "eb.embedding")}, 4) AS cosine
       |      FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b)
       |SELECT a, b, cosine FROM p
       |WHERE cosine >= 0.45
       |ORDER BY a, b""".stripMargin
  }

  /** x119: hard-negative mining for contrastive training — for each anchor
    * (vec_id % 25 = 0), the 2 highest-cosine corpus vectors from the x36
    * multi-probe LSH pool that are NOT verified near-duplicates. The
    * near-dup exclusion anti-joins x32's banded verified pair set (both
    * orientations) — the standard "mine hard, then filter false negatives"
    * recipe: a near-dup of the anchor is almost surely a POSITIVE, and
    * training on it as a negative poisons the objective. Honest semantics
    * note: the exclusion is x32's pipeline verbatim, so a high-cosine pair
    * x32's banding MISSED stays in the pool — exactly the leakage a real
    * pipeline built on that dedup pass would have ([[x26]]-style recall
    * audits quantify it). Composition: x36 candidate generation + x32
    * exclusion + per-anchor top-k. Scale: probe pool is ~9/256 of the
    * corpus per anchor (anchors broadcast), the exclusion set is the
    * banded near-dup join (subquadratic), anti-join keys on
    * (anchor, candidate) — all keyed shuffles, no all-pairs stage. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        Similarity.signBucket($"embedding", ProbeBits).as("bkt"),
        Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"bkt", $"nrm".as("qn"))
    val pool = emb.join(broadcast(probeSet(q)), $"bkt" === $"pbkt")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
    val nd = embeddingNearDupPairs(spark, dir).select($"a", $"b")
    val ndBoth = nd.select($"a".as("q_id"), $"b".as("vec_id"))
      .unionByName(nd.select($"b".as("q_id"), $"a".as("vec_id")))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    pool.join(ndBoth, Seq("q_id", "vec_id"), "left_anti")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 2)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .orderBy("q_id", "rk")
  }

  private val hardNegativesOracle = {
    val flipSelects = (1 to ProbeBits).map(i =>
      s"""SELECT q_id, qv, qn, substr(bkt, 1, ${i - 1}) || (CASE WHEN substr(bkt, $i, 1) = '1' THEN '0' ELSE '1' END) || substr(bkt, ${i + 1}, ${ProbeBits - i}) AS pbkt FROM q""")
      .mkString("\n       UNION ALL ")
    val ndBands = (0 until NearDupBands).map(t =>
      s"SELECT vec_id, $t AS band, substr(sb, ${t * NearDupRowsPerBand + 1}, $NearDupRowsPerBand) AS bh FROM e")
      .mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding,
       |             ${bucketSql("embedding", ProbeBits)} AS bkt,
       |             ${bucketSql("embedding", NearDupBands * NearDupRowsPerBand)} AS sb,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bkt FROM e WHERE vec_id % 25 = 0),
       |probes AS (
       |       SELECT q_id, qv, qn, bkt AS pbkt FROM q
       |       UNION ALL $flipSelects),
       |pool AS (SELECT probes.q_id, e.vec_id,
       |           round(${dotSql("probes.qv", "e.embedding")} / (probes.qn * e.nrm), 4) AS cosine
       |         FROM e JOIN probes ON e.bkt = probes.pbkt AND e.vec_id <> probes.q_id),
       |bands AS (
       |       $ndBands),
       |bands_pruned AS (SELECT vec_id, band, bh
       |                 FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS bn FROM bands)
       |                 WHERE bn <= ${graft.operators.Dedup.DefaultMaxBucket}),
       |ndcand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |           FROM bands_pruned x JOIN bands_pruned y
       |             ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id),
       |nd AS (SELECT a, b FROM (
       |         SELECT a, b, round(${cosineSql("ea.embedding", "eb.embedding")}, 4) AS cosine
       |         FROM ndcand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b)
       |       WHERE cosine >= 0.45),
       |ndb AS (SELECT a AS q_id, b AS vec_id FROM nd UNION ALL SELECT b AS q_id, a AS vec_id FROM nd),
       |filt AS (SELECT p.q_id, p.vec_id, p.cosine FROM pool p
       |         WHERE NOT EXISTS (SELECT 1 FROM ndb n
       |                           WHERE n.q_id = p.q_id AND n.vec_id = p.vec_id)),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM filt)
       |SELECT q_id, rk, vec_id, cosine FROM r
       |WHERE rk <= 2
       |ORDER BY q_id, rk""".stripMargin
  }

  /** JL projection shape: [[JlIn]]-d embeddings → [[JlOut]]-d sketches via
    * a fixed ±1 sign matrix (Achlioptas 2003's database-friendly variant);
    * signs derived from md5 at BUILD time, so both engines receive the
    * identical literal ± chain. */
  private val JlOut = 16
  private val JlIn = 64

  private lazy val jlSigns: IndexedSeq[IndexedSeq[Boolean]] =
    (0 until JlOut).map { j =>
      (1 to JlIn).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"jl|$j|$d".getBytes("UTF-8"))
        ((h(0) >> 4) & 0xF) >= 8
      }
    }

  /** One projected coordinate as a left-associated `0.0 + x1 - x2 ...`
    * chain — identical parse, association, and IEEE sums in both engines;
    * `el` renders the engine-specific 1-based element access. */
  private def jlSumSql(j: Int, el: Int => String): String =
    (1 to JlIn).map { d =>
      val t = el(d)
      if (jlSigns(j)(d - 1)) s"+ $t" else s"- $t"
    }.mkString("(0.0 ", " ", ")")

  private def jlProjSql(el: Int => String, mk: Seq[String] => String): String =
    mk((0 until JlOut).map(j => s"CAST(${jlSumSql(j, el)} AS FLOAT)"))

  /** x125: random-projection (JL) sketching with an HONEST distortion
    * audit — the dimensionality-reduction step an embedding pipeline runs
    * before indexing when 4× less vector bandwidth is worth a bounded
    * cosine error: every vector is projected 64→16 dims through the fixed
    * sign matrix (a per-row map, zero shuffle, 1k flops/row), then a
    * deterministic anchor-pair sample (vec_id ≡ 0 mod 100 × vec_id ≡ 0
    * mod 97, a<b) compares exact 64-d cosine against the sketch's 16-d
    * cosine: pair count, mean/max absolute error, and both mean cosines
    * (per-pair values quantized to exact fixed point before the
    * order-free sums). The measured mean error IS the operator's quality
    * contract — the same audit-the-approximation discipline as x26/x107.
    * Scale: projection is map-only; the audit joins two broadcast-sized
    * anchor sets (~n/100 × ~n/97 pairs), never corpus×corpus. */
  def jlProjection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sparkEl = (d: Int) => s"CAST(element_at(embedding, $d) AS DOUBLE)"
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding",
      expr(jlProjSql(sparkEl, ts => s"array(${ts.mkString(", ")})")).as("proj"))
      .select($"vec_id", $"embedding", $"proj",
        Similarity.norm($"embedding").as("nrm"), Similarity.norm($"proj").as("pnrm"))
    val a = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("a"), $"embedding".as("va"), $"proj".as("pa"),
        $"nrm".as("na"), $"pnrm".as("pna"))
    val b = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("b"), $"embedding".as("vb"), $"proj".as("pb"),
        $"nrm".as("nb"), $"pnrm".as("pnb"))
    val pairs = b.join(broadcast(a), $"a" < $"b")
      .select(
        round(Similarity.dot($"va", $"vb") / ($"na" * $"nb"), 4).as("c64"),
        round(Similarity.dot($"pa", $"pb") / ($"pna" * $"pnb"), 4).as("c16"))
      .select(
        floor(abs($"c64" - $"c16") * 10000 + 0.5).cast("long").as("err_fp"),
        floor($"c64" * 10000 + 0.5).cast("long").as("c64_fp"),
        floor($"c16" * 10000 + 0.5).cast("long").as("c16_fp"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum($"err_fp").as("se"), max($"err_fp").as("me"),
        sum($"c64_fp").as("s64"), sum($"c16_fp").as("s16"))
      .select($"n_pairs",
        QueryUtil.halfUp($"se".cast("double") / ($"n_pairs" * 10000).cast("double"), 6)
          .as("mean_abs_err"),
        ($"me".cast("double") / 10000.0).as("max_abs_err"),
        QueryUtil.halfUp($"s64".cast("double") / ($"n_pairs" * 10000).cast("double"), 6)
          .as("mean_cos_exact"),
        QueryUtil.halfUp($"s16".cast("double") / ($"n_pairs" * 10000).cast("double"), 6)
          .as("mean_cos_proj"))
  }

  private lazy val jlProjectionOracle = {
    val duckEl = (d: Int) => s"CAST(embedding[$d] AS DOUBLE)"
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         ${jlProjSql(duckEl, ts => s"list_value(${ts.mkString(", ")})")} AS proj
       |  FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |         round(${cosineSql("a.embedding", "b.embedding")}, 4) AS c64,
       |         round(${cosineSql("a.proj", "b.proj")}, 4) AS c16
       |  FROM e a JOIN e b ON a.vec_id % 100 = 0 AND b.vec_id % 97 = 0 AND a.vec_id < b.vec_id),
       |f AS (
       |  SELECT CAST(floor(abs(c64 - c16) * 10000 + 0.5) AS BIGINT) AS err_fp,
       |         CAST(floor(c64 * 10000 + 0.5) AS BIGINT) AS c64_fp,
       |         CAST(floor(c16 * 10000 + 0.5) AS BIGINT) AS c16_fp
       |  FROM p)
       |SELECT count(*) AS n_pairs,
       |       floor((CAST(sum(err_fp) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS mean_abs_err,
       |       CAST(max(err_fp) AS DOUBLE) / 10000.0 AS max_abs_err,
       |       floor((CAST(sum(c64_fp) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS mean_cos_exact,
       |       floor((CAST(sum(c16_fp) AS DOUBLE) / CAST(count(*) * 10000 AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS mean_cos_proj
       |FROM f""".stripMargin
  }

  /** Rocchio feedback weight (q' = q + α·centroid(top-k)). */
  private val RocchioAlpha = 0.5
  private val RocchioFb = 3

  /** x129: dense pseudo-relevance feedback — the Rocchio update in
    * embedding space (the dense twin of x84's lexical PRF): round 1 runs
    * the exact dense top-[[RocchioFb]] per query, the query vector moves
    * toward the centroid of its feedback docs (q' = q + α·c̄, with the
    * centroid built from the x35 fixed-point recipe — per-dim 1e-6
    * half-up integer sums divided by k with integer `div`, so BOTH
    * engines derive the identical q'), and round 2 re-searches the
    * corpus with q' (cast to float, the audited x30 scan shape). Emits
    * the final top-3 with a flag for documents that were already in the
    * feedback set — the rank movement IS the operator's effect. Scale:
    * two broadcast-query corpus scans plus a 64-row-per-query centroid
    * aggregate; nothing quadratic. */
  def rocchioDense(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val r1 = emb.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= RocchioFb)
      .select($"q_id", $"vec_id")
    // per-dim fixed-point centroid of the feedback docs (the x35 recipe:
    // half-up 1e-6 integer sums — order-free — divided as DOUBLE, never
    // integer division, whose trunc-vs-floor semantics differ between the
    // engines on negative sums)
    val cent = r1.join(emb.select($"vec_id", $"embedding"), "vec_id")
      .select($"q_id", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"q_id", $"pos")
      .agg(sum(floor($"v".cast("double") * 1e6 + 0.5).cast("long")).as("sfp"))
    // q' assembled in dim order, cast to float for the audited scan shape
    val q2 = cent.join(q, "q_id")
      .select($"q_id", $"pos",
        (element_at($"qv", $"pos" + 1).cast("double")
          + lit(RocchioAlpha) * ($"sfp".cast("double") / lit(RocchioFb * 1e6)))
          .cast("float").as("qd"))
      .groupBy($"q_id")
      .agg(expr("transform(sort_array(collect_list(struct(pos, qd))), s -> s.qd)").as("q2v"))
      .select($"q_id", $"q2v", Similarity.norm($"q2v").as("q2n"))
    val w2 = Window.partitionBy($"q_id").orderBy($"cosine2".desc, $"vec_id")
    emb.join(broadcast(q2), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"q2v", $"embedding") / ($"q2n" * $"nrm"), 4).as("cosine2"))
      .withColumn("rk", row_number().over(w2))
      .filter($"rk" <= 3)
      .join(r1.withColumn("fb", lit(1)), Seq("q_id", "vec_id"), "left")
      .select($"q_id", $"rk", $"vec_id", $"cosine2",
        coalesce($"fb", lit(0)).as("was_feedback"))
      .orderBy("q_id", "rk")
  }

  private val rocchioDenseOracle =
    s"""WITH e AS (SELECT vec_id, embedding,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM e WHERE vec_id % 100 = 0),
       |p1 AS (SELECT q.q_id, e.vec_id,
       |         round(${dotSql("q.qv", "e.embedding")} / (q.qn * e.nrm), 4) AS cosine
       |       FROM e JOIN q ON e.vec_id <> q.q_id),
       |r1 AS (SELECT q_id, vec_id FROM (
       |         SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |         FROM p1) WHERE rk <= $RocchioFb),
       |cent AS (SELECT r1.q_id, dd.d,
       |           CAST(sum(CAST(floor(CAST(e.embedding[CAST(dd.d AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sfp
       |         FROM r1 JOIN e ON e.vec_id = r1.vec_id,
       |              (SELECT unnest(range(1, 65)) AS d) dd
       |         GROUP BY r1.q_id, dd.d),
       |q2 AS (SELECT cent.q_id,
       |         list(CAST(CAST(q.qv[CAST(cent.d AS INTEGER)] AS DOUBLE)
       |                   + $RocchioAlpha * (CAST(cent.sfp AS DOUBLE) / ${RocchioFb * 1e6}) AS FLOAT)
       |              ORDER BY cent.d) AS q2v
       |       FROM cent JOIN q ON q.q_id = cent.q_id
       |       GROUP BY cent.q_id),
       |q2n AS (SELECT q_id, q2v, sqrt(${dotSql("q2v", "q2v")}) AS q2n FROM q2),
       |p2 AS (SELECT q2n.q_id, e.vec_id,
       |         round(${dotSql("q2n.q2v", "e.embedding")} / (q2n.q2n * e.nrm), 4) AS cosine2
       |       FROM e JOIN q2n ON e.vec_id <> q2n.q_id),
       |r2 AS (SELECT q_id, vec_id, cosine2,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cosine2 DESC, vec_id) AS rk
       |       FROM p2)
       |SELECT r2.q_id, r2.rk, r2.vec_id, r2.cosine2,
       |       CASE WHEN r1.vec_id IS NULL THEN 0 ELSE 1 END AS was_feedback
       |FROM r2 LEFT JOIN r1 ON r1.q_id = r2.q_id AND r1.vec_id = r2.vec_id
       |WHERE r2.rk <= 3
       |ORDER BY r2.q_id, r2.rk""".stripMargin

  /** X3 scale path #2 — IVF: a coarse quantizer (fixed centroid subset,
    * vec_id % 97) assigns every vector to its nearest centroid; each query
    * probes its nprobe=2 nearest clusters and searches only there. The
    * assignment/probe ranks compare cosines UNROUNDED — both engines hold
    * identical IEEE doubles, and r6 removed the round() that was itself
    * the only divergence channel. 100 TB: centroids broadcast, assignment is one scan,
    * search joins only within probed clusters (candidate set ~nprobe/k of
    * the corpus). */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val cents = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"), $"nrm".as("cn"))
    ivfSearch(spark, emb, cents)
  }

  /** nprobe=2 IVF search against an arbitrary (cent_id, cv, cn) quantizer —
    * shared by x34 (fixed seed centroids) and x35 (Lloyd-trained centroids).
    * Centroids are broadcast twice (corpus assignment + query probing);
    * the search join meets only vectors in a query's 2 probed clusters. */
  private def ivfSearch(spark: SparkSession, emb: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"nrm", $"cent_id",
        (Similarity.dot($"embedding", $"cv") / ($"nrm" * $"cn")).as("ccos"))
      .withColumn("arn", row_number().over(wAssign)).filter($"arn" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"cent_id")
    val wProbe = Window.partitionBy($"q_id").orderBy($"ccos".desc, $"cent_id")
    val probes = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
      .crossJoin(broadcast(cents))
      .select($"q_id", $"qv", $"qn", $"cent_id",
        (Similarity.dot($"qv", $"cv") / ($"qn" * $"cn")).as("ccos"))
      .withColumn("prn", row_number().over(wProbe)).filter($"prn" <= 2)
      .select($"q_id", $"qv", $"qn", $"cent_id")
    val wTop = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    probes.join(assigned, "cent_id").filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(wTop)).filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine")
      .orderBy("q_id", "rk")
  }

  private[queries] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Shared CTE prefix: corpus with norms + the fixed seed quantizer.
    * `private[queries]` so x15's SemDeDup oracle reuses the exact same
    * fragments as x34/x35 — one definition, no drift. */
  private[queries] val ivfSeedSql =
    s"""e AS (SELECT vec_id, embedding,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |c AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn FROM e WHERE vec_id % 97 = 0)""".stripMargin

  /** Nearest-centroid assignment of the whole corpus against centroid CTE
    * `$c` — `ac` + `assigned`. Shared by the x34/x35 search oracles and the
    * x15 SemDeDup oracle. */
  private[queries] def assignSql(c: String): String =
    s"""ac AS (SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
       |         ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn) AS ccos
       |       FROM e CROSS JOIN $c c),
       |assigned AS (SELECT vec_id, embedding, nrm, cent_id
       |             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM ac)
       |             WHERE rn = 1)""".stripMargin

  /** DuckDB rendering of `ivfSearch` against centroid CTE `$c`. */
  private def ivfSearchSql(c: String): String =
    s"""${assignSql(c)},
       |qc AS (SELECT e.vec_id AS q_id, e.embedding AS qv, e.nrm AS qn, c.cent_id,
       |         ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn) AS ccos
       |       FROM e CROSS JOIN $c c WHERE e.vec_id % 100 = 0),
       |probes AS (SELECT q_id, qv, qn, cent_id
       |           FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, cent_id) AS rn FROM qc)
       |           WHERE rn <= 2),
       |p AS (SELECT probes.q_id, assigned.vec_id,
       |        round(${dotSql("probes.qv", "assigned.embedding")} / (probes.qn * assigned.nrm), 4) AS cosine
       |      FROM probes JOIN assigned USING (cent_id)
       |      WHERE assigned.vec_id <> probes.q_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p)
       |SELECT q_id, rk, vec_id, cosine FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin

  private val ivfOracle =
    s"""WITH $ivfSeedSql,
       |${ivfSearchSql("c")}""".stripMargin

  /** x35 trains for this many Lloyd iterations from the x34 seed. */
  private val TrainIters = 2

  /** One Lloyd iteration in SQL — the exact fixed-point arithmetic of
    * [[Similarity.refineCentroids]]: assign each vector to its nearest
    * centroid (cosine compared unrounded, tiebreak cent_id), mean each cluster via
    * half-up 1e-6 fixed-point BIGINT sums (order-independent, so Spark's
    * partitioned sum == DuckDB's sequential sum exactly), keep the previous
    * centroid for empty/zero-norm clusters. `prev` → centroid CTE `$next`. */
  private[queries] def trainIterSql(prev: String, next: String): String = {
    val fp = Similarity.CentroidFixedPoint // 1e6, shared constant — no drift
    s"""a_$next AS (SELECT e.vec_id, e.embedding, c.cent_id,
       |         ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn) AS ccos
       |       FROM e CROSS JOIN $prev c),
       |asg_$next AS (SELECT vec_id, embedding, cent_id
       |       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM a_$next)
       |       WHERE rn = 1),
       |d_$next AS (SELECT cent_id, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM asg_$next),
       |m_$next AS (SELECT cent_id, i AS dim,
       |         CAST(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * $fp + 0.5) AS BIGINT)) AS DOUBLE)
       |              / (CAST(count(*) AS DOUBLE) * $fp) AS FLOAT) AS m
       |       FROM d_$next GROUP BY cent_id, i),
       |mv_$next AS (SELECT cent_id, list(m ORDER BY dim) AS mv FROM m_$next GROUP BY cent_id),
       |mn_$next AS (SELECT cent_id, mv, sqrt(${dotSql("mv", "mv")}) AS mn FROM mv_$next),
       |$next AS (SELECT p.cent_id,
       |         CASE WHEN q.mn > 0 THEN q.mv ELSE p.cv END AS cv,
       |         CASE WHEN q.mn > 0 THEN q.mn ELSE p.cn END AS cn
       |       FROM $prev p LEFT JOIN mn_$next q USING (cent_id))""".stripMargin
  }

  private val ivfTrainedOracle = {
    val iters = (0 until TrainIters)
      .map(k => trainIterSql(s"c$k", s"c${k + 1}")).mkString(",\n")
    s"""WITH $ivfSeedSql,
       |c0 AS (SELECT * FROM c),
       |$iters,
       |${ivfSearchSql(s"c$TrainIters")}""".stripMargin
  }

  /** X3: IVF with a TRAINED coarse quantizer — [[Similarity.refineCentroids]]
    * (2 Lloyd iterations from the x34 seed, hash-stable fixed-point means)
    * feeding the same nprobe=2 search. The oracle re-derives the trained
    * centroids in SQL from the shared constants, so the training itself is
    * correctness-gated, not just the search. 100 TB: training is
    * iters × (one broadcast-join scan + two keyed shuffles); centroids stay
    * driver-free and broadcast-sized throughout. */
  def ivfTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val seed = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"), $"nrm".as("cn"))
    val trained = Similarity.refineCentroids(emb, seed, iters = TrainIters)
    ivfSearch(spark, emb, trained)
  }

  /** Array scalar ops on the embedding column (dim, element access, L2 norm). */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir).select(
      $"vec_id",
      size($"embedding").as("dim"),
      round(element_at($"embedding", 1).cast("double"), 6).as("e1"),
      round(element_at($"embedding", 64).cast("double"), 6).as("e64"),
      round(Similarity.norm($"embedding"), 4).as("l2norm"),
      $"label")
      .orderBy("vec_id")
  }

  private val arrayOpsOracle =
    """SELECT vec_id,
      |       CAST(len(embedding) AS INTEGER) AS dim,
      |       round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
      |       round(CAST(embedding[64] AS DOUBLE), 6) AS e64,
      |       round(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |                                          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 4) AS l2norm,
      |       label
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** Embedding dimensionality of the fixture (all SFs). */
  private val Dim = 64

  /** x37: int8 scalar-quantized top-k with exact rerank — the SQ
    * compression path of a vector store: per-dimension (min, max) over the
    * corpus (order-free aggregates → deterministic "trained" scale model),
    * every vector quantized to int8 codes, the FULL scan runs on codes
    * (4× less memory bandwidth than float32 at 100 TB — the scan is
    * bandwidth-bound, so that is ~4× scan throughput), then only the top-8
    * approximate candidates per query are re-scored at full precision and
    * the top-3 emitted. Codes are carried as integer-valued floats (|q| ≤
    * 127, exact in fp32) so the approximate dot reuses the codegen'd
    * `vec_dot`; the int dot is exact in double, so CAST to BIGINT is
    * lossless and bit-identical in both engines. */
  /** Corpus coded to int8: per-dim (min, max) scale model (order-free
    * aggregates) broadcast onto every row, codes carried as
    * integer-valued floats so [[Similarity.dot]] scans them codegen'd.
    * Shared by [[int8TopK]] and the rail-bounds spec. */
  private[graft] def int8Coded(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    // Per-dim scale model: 64 rows -> one row of two ordered arrays.
    val dims = emb
      .select(posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"pos")
      .agg(min($"x".cast("double")).as("mn"), max($"x".cast("double")).as("mx"))
    val params = dims.agg(
      transform(sort_array(collect_list(struct($"pos", $"mn"))), s => s.getField("mn")).as("mns"),
      transform(sort_array(collect_list(struct($"pos", $"mx"))), s => s.getField("mx")).as("mxs"))
    val quant = transform(sequence(lit(1), lit(Dim)), i =>
      when(element_at($"mxs", i) === element_at($"mns", i), lit(0L))
        .otherwise(
          floor((element_at($"embedding", i).cast("double") - element_at($"mns", i))
            / (element_at($"mxs", i) - element_at($"mns", i)) * 254 + lit(0.5))
            - 127))
    emb.crossJoin(broadcast(params))
      .select($"vec_id", $"embedding", $"nrm", quant.cast("array<float>").as("q"))
  }

  def int8TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val coded = int8Coded(emb)
    val qs = coded.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"), $"q".as("qq"))
    val wApprox = Window.partitionBy($"q_id").orderBy($"iscore".desc, $"vec_id")
    val wExact = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    coded.join(broadcast(qs), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"qv", $"qn",
        Similarity.dot($"q", $"qq").cast("long").as("iscore"))
      .withColumn("ark", row_number().over(wApprox))
      .filter($"ark" <= 8)
      .join(emb.select($"vec_id", $"embedding".as("cv"), $"nrm".as("cn")), "vec_id")
      .select($"q_id", $"vec_id", $"iscore",
        round(Similarity.dot($"qv", $"cv") / ($"qn" * $"cn"), 4).as("cosine"))
      .withColumn("rk", row_number().over(wExact))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine", $"iscore")
      .orderBy("q_id", "rk")
  }

  private val int8TopKOracle =
    s"""WITH e AS (SELECT vec_id, embedding,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |dims AS (SELECT i,
       |           min(CAST(embedding[i] AS DOUBLE)) AS mn,
       |           max(CAST(embedding[i] AS DOUBLE)) AS mx
       |         FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i) d
       |         GROUP BY i),
       |p AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM dims),
       |coded AS (SELECT vec_id, embedding, nrm,
       |            list_transform(range(1, ${Dim + 1}), i ->
       |              CASE WHEN mxs[i] = mns[i] THEN 0
       |                   ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - mns[i])
       |                          / (mxs[i] - mns[i]) * 254 + 0.5) AS BIGINT) - 127 END) AS q
       |          FROM e, p),
       |qs AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, q AS qq
       |       FROM coded WHERE vec_id % 100 = 0),
       |pairs AS (SELECT qs.q_id, c.vec_id,
       |            CAST(list_sum(list_transform(range(1, ${Dim + 1}), i ->
       |              CAST(c.q[i] AS DOUBLE) * CAST(qs.qq[i] AS DOUBLE))) AS BIGINT) AS iscore
       |          FROM coded c JOIN qs ON c.vec_id <> qs.q_id),
       |cand AS (SELECT q_id, vec_id, iscore,
       |           row_number() OVER (PARTITION BY q_id ORDER BY iscore DESC, vec_id) AS ark
       |         FROM pairs),
       |exact AS (SELECT cand.q_id, cand.vec_id, cand.iscore,
       |            round(${dotSql("qs.qv", "e.embedding")} / (qs.qn * e.nrm), 4) AS cosine
       |          FROM cand
       |          JOIN e ON e.vec_id = cand.vec_id
       |          JOIN qs ON qs.q_id = cand.q_id
       |          WHERE cand.ark <= 8),
       |r AS (SELECT q_id, vec_id, iscore, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM exact)
       |SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cosine, iscore FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin

  /** PQ geometry: 8 subspaces × 8 dims, 16 centroids per subspace; the
    * codebook seeds are fixed corpus rows (present at every SF, disjoint
    * from nothing in particular — a seed may also be a query). */
  private[queries] val PqM = 8
  private[queries] val PqSubD = 8
  private val PqSeeds = Seq(1L, 29L, 61L, 103L, 149L, 173L, 211L, 239L,
    271L, 307L, 331L, 367L, 401L, 433L, 461L, 491L)
  private[queries] val PqRerank = 64

  /** x38: product-quantization ANN with asymmetric-distance scoring — the
    * highest-compression tier of the vector-store family (x30 brute, x31/
    * x36 LSH, x34/x35 IVF, x37 SQ): each vector is stored as M=8 one-byte
    * codes (32× smaller than fp32; K=16 centroids per subspace), a query
    * precomputes its M×K inner-product lookup table against the codebook,
    * and the scan scores a vector by summing M table entries — then the
    * top-64 approximate candidates are re-scored exactly and the top-3
    * emitted (coarse codebooks need a deeper rerank than x37's int8:
    * 64/500 ≈ 13% at sf0.01; measured recall in PLANS.md).
    *
    * Cross-engine determinism: sub-distances use the three-dot expansion
    * |s|² − 2·s·c + |c|² over the SAME float slices in both engines
    * (identical IEEE doubles); the per-subspace lookup entries are
    * quantized HALF-UP to 1e-6 fixed point BEFORE the per-pair sum, so the
    * ADC score is an integer sum — accumulation-order-free (the x35
    * trained-centroid trick applied to ADC).
    *
    * Scale notes: the codebook (M·K rows) and query tables (|Q|·M·K rows)
    * are broadcast; encoding is one argmin per (vector, subspace) pruned
    * by WindowGroupLimit before its exchange. The relational ADC join
    * shuffles (query, vector) partials; a deployment would fold the M
    * lookups per row inside the scan (mapPartitions over the broadcast
    * table) — the stored-bytes win (32×) is what matters at 100 TB. */
  /** Shared PQ plumbing: corpus with norms, per-subspace sub-vectors, and
    * the fixed seed codebook. */
  private[queries] def pqParts(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val subArr = array((0 until PqM).map(s =>
      struct(lit(s).as("s"), slice($"embedding", s * PqSubD + 1, PqSubD).as("v"))): _*)
    val seedC = PqSeeds.zipWithIndex.tail.foldLeft(when($"vec_id" === PqSeeds.head, 0)) {
      case (acc, (id, c)) => acc.when($"vec_id" === id, c)
    }
    val cb0 = emb.filter($"vec_id".isin(PqSeeds: _*))
      .select(seedC.as("c"), explode(subArr).as("sub"))
      .select($"c", $"sub.s".as("s"), $"sub.v".as("cv"))
    val sub = emb.select($"vec_id", explode(subArr).as("sub"))
      .select($"vec_id", $"sub.s".as("s"), $"sub.v".as("sv"))
    (emb, subArr, sub, cb0)
  }

  /** Shared PQ search: encode the corpus against `cb`, ADC-score the
    * broadcast query tables (fixed-point entries, integer pair sums),
    * exact-rerank the top-[[PqRerank]], emit top-3. */
  private def pqSearch(spark: SparkSession, emb: DataFrame,
                       subArr: org.apache.spark.sql.Column,
                       sub: DataFrame,
                       cb: DataFrame): DataFrame = {
    import spark.implicits._
    val wCode = Window.partitionBy($"vec_id", $"s").orderBy($"d2", $"c")
    val codes = sub
      .join(broadcast(cb), "s")
      .select($"vec_id", $"s", $"c",
        (Similarity.dot($"sv", $"sv") - lit(2.0) * Similarity.dot($"sv", $"cv")
          + Similarity.dot($"cv", $"cv")).as("d2"))
      .withColumn("rn", row_number().over(wCode))
      .filter($"rn" === 1)
      .select($"vec_id", $"s", $"c")
    val qdt = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), explode(subArr).as("sub"))
      .join(broadcast(cb), col("sub.s") === cb("s"))
      .select($"q_id", $"s", $"c",
        floor(Similarity.dot(col("sub.v"), $"cv") * lit(1e6) + lit(0.5))
          .cast("long").as("ipq_fp"))
    val wApprox = Window.partitionBy($"q_id").orderBy($"aip_fp".desc, $"vec_id")
    val wExact = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    codes.join(broadcast(qdt), Seq("s", "c"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"ipq_fp").as("aip_fp"))
      .withColumn("ark", row_number().over(wApprox))
      .filter($"ark" <= PqRerank)
      .join(emb.select($"vec_id", $"embedding".as("cv"), $"nrm".as("cn")), "vec_id")
      .join(broadcast(emb.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))), "q_id")
      .select($"q_id", $"vec_id", $"aip_fp",
        round(Similarity.dot($"qv", $"cv") / ($"qn" * $"cn"), 4).as("cosine"))
      .withColumn("rk", row_number().over(wExact))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine", $"aip_fp")
      .orderBy("q_id", "rk")
  }

  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val (emb, subArr, sub, cb0) = pqParts(spark, dir)
    pqSearch(spark, emb, subArr, sub, cb0)
  }

  /** x39: PQ with a TRAINED codebook — one squared-L2 Lloyd iteration per
    * subspace over the seed codebook ([[Similarity.refinePqCodebook]]:
    * unrounded-d2 argmin assignment (identical doubles, engine-stable), half-up 1e-6 fixed-point
    * integer means), then the same ADC search as x38. The training itself
    * is oracle-paired: the DuckDB oracle unrolls the assignment and
    * recompute CTEs and reproduces the trained codebook bit-for-bit, so
    * the hash gate certifies distributed training arithmetic == the
    * sequential reference — the x35 guarantee extended to the PQ
    * objective. */
  def pqTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    val (emb, subArr, sub, cb0) = pqParts(spark, dir)
    pqSearch(spark, emb, subArr, sub, Similarity.refinePqCodebook(sub, cb0, PqTrainIters))
  }

  private val PqTrainIters = 1

  private def pqSeedCase = PqSeeds.zipWithIndex
    .map { case (id, c) => s"WHEN vec_id = $id THEN $c" }
    .mkString("CASE ", " ", " END")
  private def pqSliceD(v: String) = s"list_slice($v, s * $PqSubD + 1, s * $PqSubD + $PqSubD)"
  private def pqDotS(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${PqSubD + 1}), j -> CAST($a[j] AS DOUBLE) * CAST($b[j] AS DOUBLE)))"

  /** Shared oracle prefix: corpus, subspaces, seed codebook, sub-vectors. */
  private def pqPrefixSql =
    s"""WITH e AS (SELECT vec_id, embedding,
       |             sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |           FROM embeddings),
       |ss AS (SELECT unnest(range(0, $PqM)) AS s),
       |cb0 AS (SELECT $pqSeedCase AS c, s, ${pqSliceD("embedding")} AS cv
       |       FROM embeddings CROSS JOIN ss
       |       WHERE vec_id IN (${PqSeeds.mkString(", ")})),
       |sub AS (SELECT vec_id, s, ${pqSliceD("embedding")} AS sv
       |        FROM embeddings CROSS JOIN ss)""".stripMargin

  private def pqSearchTailSql(cb: String) =
    s"""dist AS (SELECT sub.vec_id, sub.s, $cb.c,
       |           ${pqDotS("sv", "sv")} - 2.0 * ${pqDotS("sv", "cv")} + ${pqDotS("cv", "cv")} AS d2
       |         FROM sub JOIN $cb ON sub.s = $cb.s),
       |codes AS (SELECT vec_id, s, c
       |          FROM (SELECT vec_id, s, c,
       |                  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
       |                FROM dist)
       |          WHERE rn = 1),
       |qdt AS (SELECT q.vec_id AS q_id, $cb.s, $cb.c,
       |          CAST(floor(${pqDotS(s"list_slice(q.embedding, $cb.s * $PqSubD + 1, $cb.s * $PqSubD + $PqSubD)", s"$cb.cv")} * 1000000.0 + 0.5) AS BIGINT) AS ipq_fp
       |        FROM embeddings q CROSS JOIN $cb
       |        WHERE q.vec_id % 100 = 0),
       |approx AS (SELECT qdt.q_id, codes.vec_id,
       |             CAST(sum(qdt.ipq_fp) AS BIGINT) AS aip_fp
       |           FROM codes JOIN qdt ON codes.s = qdt.s AND codes.c = qdt.c
       |           WHERE codes.vec_id <> qdt.q_id
       |           GROUP BY qdt.q_id, codes.vec_id),
       |cand AS (SELECT q_id, vec_id, aip_fp,
       |           row_number() OVER (PARTITION BY q_id ORDER BY aip_fp DESC, vec_id) AS ark
       |         FROM approx),
       |exact AS (SELECT cand.q_id, cand.vec_id, cand.aip_fp,
       |            round(${dotSql("qe.embedding", "ce.embedding")} / (qe.nrm * ce.nrm), 4) AS cosine
       |          FROM cand
       |          JOIN e ce ON ce.vec_id = cand.vec_id
       |          JOIN e qe ON qe.vec_id = cand.q_id
       |          WHERE cand.ark <= $PqRerank),
       |r AS (SELECT q_id, vec_id, aip_fp, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM exact)
       |SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cosine, aip_fp FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin

  private val pqTopKOracle = pqPrefixSql + ",\n" + pqSearchTailSql("cb0")

  /** One unrolled Lloyd iteration `$prev` -> `$next`: UNROUNDED-d2 argmin
    * assignment, fixed-point per-dim means, empty cells fall back to the
    * PREVIOUS codebook — generated once per [[PqTrainIters]] so the oracle
    * unroll can never drift from the Spark-side loop count. */
  private def pqTrainIterSql(prev: String, next: String): String =
    s"""td_$next AS (SELECT sub.vec_id, sub.s, $prev.c,
       |         ${pqDotS("sv", "sv")} - 2.0 * ${pqDotS("sv", "cv")} + ${pqDotS("cv", "cv")} AS d2
       |       FROM sub JOIN $prev ON sub.s = $prev.s),
       |ta_$next AS (SELECT vec_id, s, c
       |       FROM (SELECT vec_id, s, c,
       |               row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
       |             FROM td_$next)
       |       WHERE rn = 1),
       |tm_$next AS (SELECT ta_$next.s, ta_$next.c, j,
       |         CAST(CAST(sum(CAST(floor(CAST(sv[j] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |              / (CAST(count(*) AS DOUBLE) * 1000000.0) AS FLOAT) AS m
       |       FROM ta_$next
       |       JOIN sub ON ta_$next.vec_id = sub.vec_id AND ta_$next.s = sub.s
       |       CROSS JOIN (SELECT unnest(range(1, ${PqSubD + 1})) AS j) jj
       |       GROUP BY ta_$next.s, ta_$next.c, j),
       |tmv_$next AS (SELECT s, c, list(m ORDER BY j) AS mv FROM tm_$next GROUP BY s, c),
       |$next AS (SELECT $prev.s, $prev.c, coalesce(tmv_$next.mv, $prev.cv) AS cv
       |        FROM $prev LEFT JOIN tmv_$next ON $prev.s = tmv_$next.s AND $prev.c = tmv_$next.c)""".stripMargin

  private val pqTrainedOracle = {
    val iters = (0 until PqTrainIters)
      .map(k => pqTrainIterSql(s"cb$k", s"cb${k + 1}")).mkString(",\n")
    pqPrefixSql + ",\n" + iters + ",\n" + pqSearchTailSql(s"cb$PqTrainIters")
  }

  /** IVF-PQ probes this many coarse clusters per query (matches x34). */
  private val IvfPqNprobe = 2

  /** x109: IVF-PQ — the two scale paths composed, the FAISS-style IVFPQ
    * index shape that actually ships at 100 TB: the coarse quantizer
    * (x34's fixed centroid subset) prunes the corpus to nprobe=2 clusters
    * per query, and WITHIN the surviving clusters vectors are scored by
    * x38's compressed ADC codes (M=8 byte codes, fixed-point integer
    * table sums), then the top-[[PqRerank]] approximate candidates are
    * exactly re-scored and the top-3 emitted. Versus x38 alone the ADC
    * join touches ~nprobe/k of the corpus; versus x34 alone the scored
    * bytes shrink 32× — multiplicative wins, which is why the composition
    * is the production layout. Cross-engine determinism is inherited
    * per-part: coarse assignment/probing compare UNROUNDED cosines
    * (identical IEEE doubles), ADC scores are order-free integer sums of
    * half-up 1e-6 fixed-point table entries.
    * Scale: centroids + codebook + query tables broadcast; the only
    * shuffles are the per-(vector,subspace) encode argmin and the
    * candidate ADC aggregation, both pruned before exchange. */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (emb, subArr, sub, cb0) = pqParts(spark, dir)
    val cents = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("ccv"), $"nrm".as("ccn"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id",
        (Similarity.dot($"embedding", $"ccv") / ($"nrm" * $"ccn")).as("ccos"))
      .withColumn("arn", row_number().over(wAssign)).filter($"arn" === 1)
      .select($"vec_id", $"cent_id")
    val wProbe = Window.partitionBy($"q_id").orderBy($"ccos".desc, $"cent_id")
    val probes = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
      .crossJoin(broadcast(cents))
      .select($"q_id", $"cent_id",
        (Similarity.dot($"qv", $"ccv") / ($"qn" * $"ccn")).as("ccos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter($"prn" <= IvfPqNprobe)
      .select($"q_id", $"cent_id")
    val wCode = Window.partitionBy($"vec_id", $"s").orderBy($"d2", $"c")
    val codes = sub
      .join(broadcast(cb0), "s")
      .select($"vec_id", $"s", $"c",
        (Similarity.dot($"sv", $"sv") - lit(2.0) * Similarity.dot($"sv", $"cv")
          + Similarity.dot($"cv", $"cv")).as("d2"))
      .withColumn("rn", row_number().over(wCode))
      .filter($"rn" === 1)
      .select($"vec_id", $"s", $"c")
    val qdt = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), explode(subArr).as("sub"))
      .join(broadcast(cb0), col("sub.s") === cb0("s"))
      .select($"q_id", $"s", $"c",
        floor(Similarity.dot(col("sub.v"), $"cv") * lit(1e6) + lit(0.5))
          .cast("long").as("ipq_fp"))
    val candPairs = probes.join(assigned, "cent_id")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id")
    val wApprox = Window.partitionBy($"q_id").orderBy($"aip_fp".desc, $"vec_id")
    val wExact = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    candPairs.join(codes, "vec_id")
      .join(broadcast(qdt), Seq("q_id", "s", "c"))
      .groupBy($"q_id", $"vec_id")
      .agg(sum($"ipq_fp").as("aip_fp"))
      .withColumn("ark", row_number().over(wApprox))
      .filter($"ark" <= PqRerank)
      .join(emb.select($"vec_id", $"embedding".as("dv"), $"nrm".as("dn")), "vec_id")
      .join(broadcast(emb.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))), "q_id")
      .select($"q_id", $"vec_id", $"aip_fp",
        round(Similarity.dot($"qv", $"dv") / ($"qn" * $"dn"), 4).as("cosine"))
      .withColumn("rk", row_number().over(wExact))
      .filter($"rk" <= 3)
      .select($"q_id", $"rk", $"vec_id", $"cosine", $"aip_fp")
      .orderBy("q_id", "rk")
  }

  private val ivfPqOracle =
    s"""$pqPrefixSql,
       |c AS (SELECT vec_id AS cent_id, embedding AS ccv, nrm AS ccn
       |      FROM e WHERE vec_id % 97 = 0),
       |ac AS (SELECT e.vec_id, c.cent_id,
       |         ${dotSql("e.embedding", "c.ccv")} / (e.nrm * c.ccn) AS ccos
       |       FROM e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cent_id
       |             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM ac)
       |             WHERE rn = 1),
       |qc AS (SELECT e.vec_id AS q_id, c.cent_id,
       |         ${dotSql("e.embedding", "c.ccv")} / (e.nrm * c.ccn) AS ccos
       |       FROM e CROSS JOIN c WHERE e.vec_id % 100 = 0),
       |probes AS (SELECT q_id, cent_id
       |           FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, cent_id) AS rn FROM qc)
       |           WHERE rn <= $IvfPqNprobe),
       |dist AS (SELECT sub.vec_id, sub.s, cb0.c,
       |           ${pqDotS("sv", "sv")} - 2.0 * ${pqDotS("sv", "cv")} + ${pqDotS("cv", "cv")} AS d2
       |         FROM sub JOIN cb0 ON sub.s = cb0.s),
       |codes AS (SELECT vec_id, s, c
       |          FROM (SELECT vec_id, s, c,
       |                  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
       |                FROM dist)
       |          WHERE rn = 1),
       |qdt AS (SELECT q.vec_id AS q_id, cb0.s, cb0.c,
       |          CAST(floor(${pqDotS(s"list_slice(q.embedding, cb0.s * $PqSubD + 1, cb0.s * $PqSubD + $PqSubD)", "cb0.cv")} * 1000000.0 + 0.5) AS BIGINT) AS ipq_fp
       |        FROM embeddings q CROSS JOIN cb0
       |        WHERE q.vec_id % 100 = 0),
       |candpairs AS (SELECT probes.q_id, assigned.vec_id
       |              FROM probes JOIN assigned USING (cent_id)
       |              WHERE assigned.vec_id <> probes.q_id),
       |approx AS (SELECT cp.q_id, cp.vec_id,
       |             CAST(sum(qdt.ipq_fp) AS BIGINT) AS aip_fp
       |           FROM candpairs cp
       |           JOIN codes ON codes.vec_id = cp.vec_id
       |           JOIN qdt ON qdt.q_id = cp.q_id AND qdt.s = codes.s AND qdt.c = codes.c
       |           GROUP BY cp.q_id, cp.vec_id),
       |cand AS (SELECT q_id, vec_id, aip_fp,
       |           row_number() OVER (PARTITION BY q_id ORDER BY aip_fp DESC, vec_id) AS ark
       |         FROM approx),
       |exact AS (SELECT cand.q_id, cand.vec_id, cand.aip_fp,
       |            round(${dotSql("qe.embedding", "ce.embedding")} / (qe.nrm * ce.nrm), 4) AS cosine
       |          FROM cand
       |          JOIN e ce ON ce.vec_id = cand.vec_id
       |          JOIN e qe ON qe.vec_id = cand.q_id
       |          WHERE cand.ark <= $PqRerank),
       |r AS (SELECT q_id, vec_id, aip_fp, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM exact)
       |SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, cosine, aip_fp FROM r
       |WHERE rk <= 3
       |ORDER BY q_id, rk""".stripMargin

  /** x79: nearest-centroid classification — the supervised counterpart of
    * the x34/x35 quantizer family: per-LABEL mean centroids trained on a
    * deterministic holdout split (vec_id % 5 ≠ 0) with the x35 fixed-point
    * recipe (half-up 1e-6 BIGINT sums → order-free, hash-stable training),
    * then every held-out vector is assigned to its max-cosine label
    * centroid and the confusion matrix (with per-true-label shares) comes
    * out — the standard embedding-probe evaluation a corpus pipeline runs
    * to sanity-check embedding quality. Scale: training is one posexplode
    * + keyed aggregation; assignment is a |labels|-row broadcast
    * crossJoin; nothing driver-side. */
  def centroidClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Similarity.CentroidFixedPoint
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"),
        $"label")
    val train = emb.filter($"vec_id" % 5 =!= 0)
    val eval = emb.filter($"vec_id" % 5 === 0)
    val cents = train
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"dim")
      .agg(sum(floor($"x".cast("double") * fp + lit(0.5))).as("sx"),
        count(lit(1)).as("nx"))
      .select($"label", $"dim",
        ($"sx".cast("double") / ($"nx".cast("double") * fp)).cast("float").as("m"))
      .groupBy($"label")
      .agg(transform(sort_array(collect_list(struct($"dim", $"m"))),
        e => e.getField("m")).as("cv"))
      .select($"label".as("clabel"), $"cv", Similarity.norm($"cv").as("cn"))
    val wA = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"clabel")
    val assigned = eval.crossJoin(broadcast(cents))
      .select($"vec_id", $"label", $"clabel",
        (Similarity.dot($"embedding", $"cv") / ($"nrm" * $"cn")).as("ccos"))
      .withColumn("rn", row_number().over(wA)).filter($"rn" === 1)
    assigned.groupBy($"label", $"clabel".as("assigned"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_label", sum($"n").over(Window.partitionBy($"label")))
      .select($"label", $"assigned", $"n",
        QueryUtil.halfUp4($"n".cast("double") / $"n_label".cast("double")).as("share"))
      .orderBy("label", "assigned")
  }

  private val centroidClassifyOracle = {
    val fp = Similarity.CentroidFixedPoint
    s"""WITH e2 AS (SELECT vec_id, embedding, label,
       |              sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |            FROM embeddings),
       |tr AS (SELECT * FROM e2 WHERE vec_id % 5 <> 0),
       |ev AS (SELECT * FROM e2 WHERE vec_id % 5 = 0),
       |d AS (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM tr),
       |m AS (SELECT label, i AS dim,
       |        CAST(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * $fp + 0.5) AS BIGINT)) AS DOUBLE)
       |             / (CAST(count(*) AS DOUBLE) * $fp) AS FLOAT) AS m
       |      FROM d GROUP BY label, i),
       |mv AS (SELECT label AS clabel, list(m ORDER BY dim) AS cv FROM m GROUP BY label),
       |c AS (SELECT clabel, cv, sqrt(${dotSql("cv", "cv")}) AS cn FROM mv),
       |a AS (SELECT ev.vec_id, ev.label, c.clabel,
       |        ${dotSql("ev.embedding", "c.cv")} / (ev.nrm * c.cn) AS ccos
       |      FROM ev CROSS JOIN c),
       |asg AS (SELECT vec_id, label, clabel
       |        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn FROM a)
       |        WHERE rn = 1),
       |cm AS (SELECT label, clabel AS assigned, count(*) AS n FROM asg GROUP BY label, clabel)
       |SELECT label, assigned, n,
       |       floor((CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS share
       |FROM cm
       |ORDER BY label, assigned""".stripMargin
  }

  /** x73: embedding drift monitor — the dense counterpart of x23's
    * text-distribution drift: split the corpus into two deterministic
    * halves (vec_id parity — stand-in for the before/after snapshots a
    * production monitor compares), train per-(label, half) fixed-point
    * centroids (the x79/x35 recipe), and report each label's cross-half
    * centroid cosine plus its population shift. A drifting embedding
    * space (re-trained encoder, corrupted batch) shows up as cosines
    * dropping from ~1. Scale: one posexplode aggregate per half; the
    * cosine runs on |labels| centroid pairs. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Similarity.CentroidFixedPoint
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", $"label", ($"vec_id" % 2).as("half"))
    val cents = emb
      .select($"label", $"half", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"half", $"dim")
      .agg(sum(floor($"x".cast("double") * fp + lit(0.5))).as("sx"),
        count(lit(1)).as("nx"))
      .select($"label", $"half", $"dim", $"nx",
        ($"sx".cast("double") / ($"nx".cast("double") * fp)).cast("float").as("m"))
      .groupBy($"label", $"half")
      .agg(transform(sort_array(collect_list(struct($"dim", $"m"))),
        e => e.getField("m")).as("cv"),
        min($"nx").as("n")) // nx identical across dims; min mirrors the oracle
    val c0 = cents.filter($"half" === 0)
      .select($"label", $"cv".as("cv0"), $"n".as("n0"))
    val c1 = cents.filter($"half" === 1)
      .select($"label", $"cv".as("cv1"), $"n".as("n1"))
    c0.join(c1, "label")
      .select($"label", $"n0", $"n1",
        QueryUtil.halfUp4(Similarity.dot($"cv0", $"cv1")
          / (Similarity.norm($"cv0") * Similarity.norm($"cv1"))).as("drift_cos"))
      .orderBy("label")
  }

  private val embeddingDriftOracle = {
    val fp = Similarity.CentroidFixedPoint
    s"""WITH d AS (SELECT label, vec_id % 2 AS half, embedding,
       |             unnest(range(1, len(embedding) + 1)) AS i
       |           FROM embeddings),
       |m AS (SELECT label, half, i AS dim,
       |        CAST(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * $fp + 0.5) AS BIGINT)) AS DOUBLE)
       |             / (CAST(count(*) AS DOUBLE) * $fp) AS FLOAT) AS m,
       |        count(*) AS nx
       |      FROM d GROUP BY label, half, i),
       |mv AS (SELECT label, half, list(m ORDER BY dim) AS cv, min(nx) AS n
       |       FROM m GROUP BY label, half)
       |SELECT c0.label, c0.n AS n0, c1.n AS n1,
       |       floor((${dotSql("c0.cv", "c1.cv")}
       |              / (sqrt(${dotSql("c0.cv", "c0.cv")}) * sqrt(${dotSql("c1.cv", "c1.cv")}))) * 10000 + 0.5) / 10000.0 AS drift_cos
       |FROM mv c0 JOIN mv c1 ON c0.label = c1.label AND c0.half = 0 AND c1.half = 1
       |ORDER BY c0.label""".stripMargin
  }

  /** x102: per-dimension embedding statistics — the dead/degenerate-
    * dimension QA a vector store runs before trusting distances: per dim,
    * exact-moment mean and variance (values half-up-quantized to 1e-6
    * BIGINTs first — the q59 recipe, so Σq and Σq² are order-free integer
    * sums and mean/var derive by identical IEEE ops in both engines), the
    * exact min/max, and a zero-spread degeneracy flag (integer predicate
    * on the quantized domain). Scale: one posexplode + 64-group aggregate;
    * everything downstream is constant-sized. */
  def dimStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select(posexplode($"embedding").as(Seq("dim", "x")))
      .select($"dim", floor($"x".cast("double") * 1e6 + 0.5).cast("long").as("q"))
    q.groupBy($"dim")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"),
        sum($"q".cast("decimal(38,0)") * $"q".cast("decimal(38,0)")).as("ssq"),
        min($"q").as("mnq"), max($"q").as("mxq"))
      .select($"dim", $"n",
        QueryUtil.halfUp($"s".cast("double") / ($"n".cast("double") * 1e6), 6)
          .as("mean"),
        QueryUtil.halfUp(
          greatest($"ssq".cast("double") / $"n".cast("double")
            - ($"s".cast("double") / $"n".cast("double"))
            * ($"s".cast("double") / $"n".cast("double")), lit(0.0)) / 1e12, 6)
          .as("variance"),
        ($"mnq".cast("double") / 1e6).as("min_v"),
        ($"mxq".cast("double") / 1e6).as("max_v"),
        ($"mnq" === $"mxq").as("degenerate"))
      .orderBy("dim")
  }

  private val dimStatsOracle =
    """WITH q AS (SELECT i AS dim,
      |             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS q
      |           FROM (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i
      |                 FROM embeddings)),
      |a AS (SELECT dim, count(*) AS n, sum(q) AS s,
      |        sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS ssq,
      |        min(q) AS mnq, max(q) AS mxq
      |      FROM q GROUP BY dim)
      |SELECT CAST(dim - 1 AS INTEGER) AS dim, n,
      |       floor((CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) * 1000000 + 0.5) / 1000000.0 AS mean,
      |       floor((greatest(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE)
      |                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0) / 1000000000000.0) * 1000000 + 0.5) / 1000000.0 AS variance,
      |       CAST(mnq AS DOUBLE) / 1000000.0 AS min_v,
      |       CAST(mxq AS DOUBLE) / 1000000.0 AS max_v,
      |       mnq = mxq AS degenerate
      |FROM a
      |ORDER BY dim""".stripMargin

  /** x105: reciprocal (mutual) nearest neighbors — pairs where EACH vector
    * ranks the other in its top-5 over a shared cohort (every 10th vector
    * — denser than x30's every-100th query set, because BOTH directions
    * need a ranking and mutual pairs must actually exist): the
    * high-precision pairing primitive under clustering and near-dup
    * verification, since one-directional neighbors are asymmetric-hub
    * noise. Same ranking recipe as x30 (rounded cosine, vec_id
    * tie-break), restricted to the cohort on both sides. Scale: a
    * K·|cohort|-row frame joined to itself on the ordered pair. */
  def mutualKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Cohort = every 10th vector, ranked WITHIN the cohort (both directions
    // must have a ranking for mutuality to be well-defined).
    val co = Tables.embeddings(spark, dir).filter($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    val top = co.select($"vec_id".as("q_id"), $"embedding".as("qv"), $"nrm".as("qn"))
      .join(co, $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(Similarity.dot($"qv", $"embedding") / ($"qn" * $"nrm"), 4).as("cosine"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
    top.as("f").join(top.as("r"),
      $"f.q_id" === $"r.vec_id" && $"f.vec_id" === $"r.q_id" &&
        $"f.q_id" < $"f.vec_id")
      .select($"f.q_id".as("a"), $"f.vec_id".as("b"),
        $"f.rk".as("rk_ab"), $"r.rk".as("rk_ba"), $"f.cosine")
      .orderBy("a", "b")
  }

  private val mutualKnnOracle =
    s"""WITH co AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
       |p AS (SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |        round(${cosineSql("q.embedding", "e.embedding")}, 4) AS cosine
       |      FROM co e JOIN co q ON e.vec_id <> q.vec_id),
       |r AS (SELECT q_id, vec_id, cosine,
       |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |      FROM p),
       |top AS (SELECT q_id, vec_id, rk, cosine FROM r WHERE rk <= 5)
       |SELECT f.q_id AS a, f.vec_id AS b,
       |       f.rk AS rk_ab, rr.rk AS rk_ba, f.cosine
       |FROM top f JOIN top rr
       |  ON f.q_id = rr.vec_id AND f.vec_id = rr.q_id AND f.q_id < f.vec_id
       |ORDER BY a, b""".stripMargin

  /** x107: IVF recall audit — recall@3 of the coarse-quantized search
    * (x34) against the exact brute-force ranking (x30), per query and
    * overall: the quality number a vector store publishes next to its
    * latency. Both sides are the already-verified queries; the audit is
    * an outer join of two K-row-per-query lists (x26's pattern on the
    * dense family). Exact integer hit counts; one division. */
  def ivfRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = cosineTopK(spark, dir).filter($"rk" <= 3)
      .select($"q_id", $"vec_id", lit(1L).as("in_exact"))
    val approx = ivfTopK(spark, dir)
      .select($"q_id", $"vec_id", lit(1L).as("in_ivf"))
    exact.join(approx, Seq("q_id", "vec_id"), "full")
      .groupBy($"q_id")
      .agg(sum(coalesce($"in_exact", lit(0L))).as("n_exact"),
        sum(coalesce($"in_ivf", lit(0L))).as("n_ivf"),
        sum(when($"in_exact".isNotNull && $"in_ivf".isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .select($"q_id", $"n_exact", $"n_ivf", $"n_hit",
        QueryUtil.halfUp4($"n_hit".cast("double") / $"n_exact".cast("double"))
          .as("recall_at_3"))
      .orderBy("q_id")
  }

  private val ivfRecallAuditOracle =
    s"""WITH $ivfSeedSql,
       |${assignSql("c")},
       |qc AS (SELECT e.vec_id AS q_id, e.embedding AS qv, e.nrm AS qn, c.cent_id,
       |         ${dotSql("e.embedding", "c.cv")} / (e.nrm * c.cn) AS ccos
       |       FROM e CROSS JOIN c c WHERE e.vec_id % 100 = 0),
       |probes AS (SELECT q_id, qv, qn, cent_id
       |           FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, cent_id) AS rn FROM qc)
       |           WHERE rn <= 2),
       |ip AS (SELECT probes.q_id, assigned.vec_id,
       |        round(${dotSql("probes.qv", "assigned.embedding")} / (probes.qn * assigned.nrm), 4) AS cosine
       |      FROM probes JOIN assigned USING (cent_id)
       |      WHERE assigned.vec_id <> probes.q_id),
       |ivf AS (SELECT q_id, vec_id FROM (
       |          SELECT q_id, vec_id,
       |            row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |          FROM ip) WHERE rk <= 3),
       |bp AS (SELECT q.q_id, e2.vec_id,
       |        round(${dotSql("q.qv", "e2.embedding")} / (q.qn * e2.nrm), 4) AS cosine
       |      FROM e e2 JOIN (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM e
       |                      WHERE vec_id % 100 = 0) q ON e2.vec_id <> q.q_id),
       |ex AS (SELECT q_id, vec_id FROM (
       |          SELECT q_id, vec_id,
       |            row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |          FROM bp) WHERE rk <= 3)
       |SELECT coalesce(ex.q_id, ivf.q_id) AS q_id,
       |       CAST(sum(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ivf,
       |       CAST(sum(CASE WHEN ex.vec_id IS NOT NULL AND ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |       floor((CAST(sum(CASE WHEN ex.vec_id IS NOT NULL AND ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |              / CAST(sum(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS recall_at_3
       |FROM ex FULL OUTER JOIN ivf ON ex.q_id = ivf.q_id AND ex.vec_id = ivf.vec_id
       |GROUP BY coalesce(ex.q_id, ivf.q_id)
       |ORDER BY q_id""".stripMargin

  /** x108: embedding coverage QA — the referential check between the text
    * corpus and its vector index (ids are row-aligned across the two
    * tables, the x81 layout): per source, how many docs have an embedding,
    * how many vectors are orphaned (no doc), and the coverage rate. The
    * gate a RAG/setup pipeline runs before trusting retrieval. Exact
    * integer counts, one division; orphans reported as their own row.
    * Scale: one outer join on the id + a |sources|-group aggregate. */
  def embeddingCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"source")
    val e = Tables.embeddings(spark, dir).select($"vec_id", lit(1L).as("has_vec"))
    d.join(e, $"doc_id" === $"vec_id", "full")
      .select(coalesce($"source", lit("_orphan_vectors")).as("source"),
        ($"doc_id".isNotNull).cast("long").as("is_doc"),
        coalesce($"has_vec", lit(0L)).as("has_vec"))
      .groupBy($"source")
      .agg(sum($"is_doc").as("n_docs"),
        sum($"is_doc" * $"has_vec").as("n_covered"),
        sum((lit(1L) - $"is_doc") * $"has_vec").as("n_orphan_vecs"))
      .select($"source", $"n_docs", $"n_covered", $"n_orphan_vecs",
        when($"n_docs" > 0,
          QueryUtil.halfUp4($"n_covered".cast("double") / $"n_docs".cast("double")))
          .otherwise(lit(0.0)).as("coverage"))
      .orderBy("source")
  }

  private val embeddingCoverageOracle =
    """WITH j AS (SELECT coalesce(d.source, '_orphan_vectors') AS source,
      |             CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_doc,
      |             CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS has_vec
      |           FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id)
      |SELECT source, CAST(sum(is_doc) AS BIGINT) AS n_docs,
      |       CAST(sum(is_doc * has_vec) AS BIGINT) AS n_covered,
      |       CAST(sum((1 - is_doc) * has_vec) AS BIGINT) AS n_orphan_vecs,
      |       CASE WHEN sum(is_doc) > 0
      |            THEN floor((CAST(sum(is_doc * has_vec) AS DOUBLE) / CAST(sum(is_doc) AS DOUBLE)) * 10000 + 0.5) / 10000.0
      |            ELSE 0.0 END AS coverage
      |FROM j
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Power-iteration round count (fixed — the oracle unrolls them). */
  private val PcaRounds = 3

  /** Embedding quantization for the covariance pass: 1e-4 fixed point
    * (|x| ≤ ~0.6 here, so q ≤ ~6e3 and pair products ≤ ~4e7). */
  private val PcaFp = 1e4

  /** x116: top principal component by power iteration — the PCA/whitening
    * prep an embedding pipeline runs before ANN indexing or drift
    * analysis. The covariance matrix never touches floats: embeddings
    * quantize to 1e-4 fixed point, the pair products come from a DOUBLE
    * posexplode of each row's own quantized array (array-local — no
    * self-join, the x20 zero-shuffle pair recipe), and the mean is
    * cleared exactly via n²·Cov_jk = n·Σq_jq_k − S_j·S_k in
    * decimal/HUGEINT. Three power-iteration rounds then run on the
    * 4096-row matrix frame: integer mat-vec (order-free decimal sums),
    * pivot = max-|component| (min-dim tie-break), components re-quantized
    * half-up to 1e-6 after the one double division per round — the x35
    * trained-aggregate recipe, so the "trained" eigenvector is
    * hash-stable and oracle-paired. Output: each dimension's loading in
    * pivot-normalized [-1, 1]. Scale: one 4096-way widened scan pass
    * (partial aggs map-side), then constant 64/4096-row frames; rounds
    * are driver-composed joins, no collect. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val qv = Tables.embeddings(spark, dir).select($"vec_id",
      transform($"embedding",
        x => floor(x.cast("double") * PcaFp + 0.5).cast("long")).as("qa"))
    val pairs = qv
      .select($"qa", posexplode($"qa").as(Seq("j", "qj")))
      .select($"j", $"qj", posexplode($"qa").as(Seq("k", "qk")))
    val p = pairs.groupBy($"j", $"k")
      .agg(sum($"qj".cast(dec) * $"qk".cast(dec)).as("pjk"))
    val s = qv.select(posexplode($"qa").as(Seq("j", "qj")))
      .groupBy($"j").agg(sum($"qj").as("sj"), count(lit(1)).as("nj"))
    val n = qv.agg(count(lit(1)).as("n"))
    val m = p
      .join(broadcast(s.select($"j", $"sj")), "j")
      .join(broadcast(s.select($"j".as("k"), $"sj".as("sk"))), "k")
      .crossJoin(broadcast(n))
      .select($"j", $"k",
        ($"n".cast(dec) * $"pjk" - $"sj".cast(dec) * $"sk".cast(dec)).as("mv"))
    val v0 = spark.range(64).select($"id".cast("int").as("k"),
      lit(1000000L).as("v"))
    val vFinal = (1 to PcaRounds).foldLeft(v0) { (v, _) =>
      val t = m.join(v, "k").groupBy($"j").agg(sum($"mv" * $"v").as("t"))
      val piv = t.orderBy(abs($"t").desc, $"j".asc).limit(1)
        .select($"t".as("pv"))
      t.crossJoin(broadcast(piv))
        .select($"j".as("k"),
          floor($"t".cast("double") / $"pv".cast("double") * 1e6 + 0.5)
            .cast("long").as("v"))
    }
    vFinal.select($"k".as("dim"), ($"v".cast("double") / 1e6).as("loading"))
      .orderBy("dim")
  }

  private val pcaPowerOracle = {
    val rounds = (1 to PcaRounds).map { r =>
      s"""t$r AS (SELECT m.j, sum(m.mv * v${r - 1}.v) AS t
         |       FROM m JOIN v${r - 1} ON m.k = v${r - 1}.k GROUP BY m.j),
         |piv$r AS (SELECT t AS pv FROM t$r ORDER BY abs(t) DESC, j ASC LIMIT 1),
         |v$r AS (SELECT j AS k,
         |          CAST(floor(CAST(t AS DOUBLE) / CAST(pv AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v
         |        FROM t$r, piv$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS MATERIALIZED (
       |  SELECT list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qa
       |  FROM embeddings),
       |p AS (
       |  SELECT j, k, sum(CAST(qa[j] AS HUGEINT) * qa[k]) AS pjk
       |  FROM d, (SELECT unnest(range(1, 65)) AS j), (SELECT unnest(range(1, 65)) AS k)
       |  GROUP BY j, k),
       |s AS (SELECT j, sum(qa[j]) AS sj FROM d, (SELECT unnest(range(1, 65)) AS j) GROUP BY j),
       |n AS (SELECT count(*) AS n FROM d),
       |m AS MATERIALIZED (
       |  SELECT p.j - 1 AS j, p.k - 1 AS k,
       |         CAST(n.n AS HUGEINT) * p.pjk - sa.sj * sb.sj AS mv
       |  FROM p JOIN s sa ON p.j = sa.j JOIN s sb ON p.k = sb.j, n),
       |v0 AS (SELECT CAST(range AS INTEGER) AS k, CAST(1000000 AS HUGEINT) AS v FROM range(64)),
       |$rounds
       |SELECT CAST(k AS INTEGER) AS dim, CAST(v AS DOUBLE) / 1000000.0 AS loading
       |FROM v$PcaRounds
       |ORDER BY dim""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x116_pca_power",
      "top principal component of the embedding table: exact-integer covariance + fixed-point power iteration",
      pcaPower, Some(pcaPowerOracle)),
    QueryDef("x108_embedding_coverage",
      "doc-vs-vector referential coverage report per source (RAG index QA)",
      embeddingCoverage, Some(embeddingCoverageOracle)),
    QueryDef("x107_ivf_recall_audit",
      "recall@3 of IVF nprobe=2 vs the exact brute-force ranking, per query (X3 quality gate)",
      ivfRecallAudit, Some(ivfRecallAuditOracle)),
    QueryDef("x105_mutual_knn",
      "reciprocal nearest-neighbor pairs over the dense top-5 (mutual-kNN primitive)",
      mutualKnn, Some(mutualKnnOracle)),
    QueryDef("x102_dim_stats",
      "per-dimension embedding QA: exact-moment mean/variance, range, degeneracy flags",
      dimStats, Some(dimStatsOracle)),
    QueryDef("x73_embedding_drift",
      "per-label cross-half centroid cosine: embedding-space drift monitor (fixed-point centroids)",
      embeddingDrift, Some(embeddingDriftOracle)),
    QueryDef("x79_centroid_classify",
      "nearest-centroid label classifier: fixed-point supervised centroids + confusion matrix",
      centroidClassify, Some(centroidClassifyOracle)),
    QueryDef("x30_cosine_topk", "brute-force cosine top-5 per query vector (X3)", cosineTopK, Some(cosineTopKOracle)),
    QueryDef("x31_sign_lsh_topk", "sign-LSH bucketed approximate top-3 (X3)", signLshTopK, Some(signLshOracle)),
    QueryDef("x32_embedding_neardup", "embedding cosine near-dup pairs (X2)", embeddingNearDup, Some(nearDupOracle)),
    QueryDef("x33_array_ops", "array scalar ops over embedding column", arrayOps, Some(arrayOpsOracle)),
    // x34/x35/x38/x39/x109 are benchSkip'd as of r15 (verdict #8 hygiene):
    // their stages are strict subsets of x363_pq_residual_topk (Lloyd-
    // trained coarse quantizer = the IVF path, trained PQ codebook + ADC
    // scan + bounded exact rerank = the PQ path, composed = IVF-PQ), which
    // stays timed. All five remain Verify/selfcheck-gated every round.
    QueryDef("x34_ivf_topk", "IVF coarse-quantized ANN, nprobe=2 (X3 scale path)", ivfTopK, Some(ivfOracle), benchSkip = true),
    QueryDef("x35_ivf_trained_topk", "IVF ANN with Lloyd-trained quantizer, fixed-point hash-stable training (X3)", ivfTrainedTopK, Some(ivfTrainedOracle), benchSkip = true),
    QueryDef("x36_multiprobe_lsh", "multi-probe sign-LSH top-3: base + 8 Hamming-1 buckets (X3)", multiProbeLshTopK, Some(multiProbeOracle)),
    QueryDef("x37_int8_topk", "int8 scalar-quantized scan + exact rerank top-3 (X3)", int8TopK, Some(int8TopKOracle)),
    QueryDef("x38_pq_topk", "product-quantization ADC top-3 with exact rerank (X3)", pqTopK, Some(pqTopKOracle), benchSkip = true),
    QueryDef("x39_pq_trained_topk", "PQ ANN with L2-Lloyd-trained codebook, fixed-point hash-stable training (X3)", pqTrainedTopK, Some(pqTrainedOracle), benchSkip = true),
    QueryDef("x109_ivfpq_topk", "IVF-PQ composed index: coarse cluster pruning + compressed ADC scoring + exact rerank (X3)", ivfPqTopK, Some(ivfPqOracle), benchSkip = true),
    QueryDef("x119_hard_negatives",
      "contrastive hard-negative mining: multi-probe LSH pool anti-joined against verified near-dups, top-2 per anchor",
      hardNegatives, Some(hardNegativesOracle)),
    QueryDef("x125_jl_projection",
      "random-projection (JL) 64-to-16-dim sketching with anchor-pair cosine distortion audit (X3 bandwidth path)",
      jlProjection, Some(jlProjectionOracle)),
    QueryDef("x129_rocchio_dense",
      "dense pseudo-relevance feedback: Rocchio query update (fixed-point centroid) + second-round re-search (X3)",
      rocchioDense, Some(rocchioDenseOracle)))
}
