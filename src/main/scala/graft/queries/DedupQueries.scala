package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, Etl, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryUtil.halfUp4

/** Deduplication coverage over `documents` (north star X1/X2): exact
  * content-hash dedup, MinHash+LSH near-dup detection (3-token shingles, 12
  * hashes, 4 bands × 3 rows, Jaccard-verified), SimHash bucketing, and
  * char-n-gram Jaccard similarity. */
object DedupQueries {

  /** 3-token sequence shingles (order-sensitive — permuted docs don't
    * collide), sorted-distinct, whole-text fallback for docs shorter than k
    * tokens. Native one-pass expression (graft.functions.TokenShingles). */
  private[queries] def tokenShingles(text: org.apache.spark.sql.Column) =
    call_function("token_shingles", text, lit(3))

  private[queries] val shinglesSql =
    """list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
      |    ELSE [text] END)""".stripMargin

  /** X1: exact dedup by full-content hash; deterministic survivor (min
    * doc_id), like the reference's first-insert-wins unique key (D1). */
  def exactDedup(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val hashed = Tables.documents(spark, dir)
      .select($"doc_id", md5($"text").as("content_hash"))
    Etl.dedupByHash(hashed, "content_hash", Seq("doc_id")).orderBy("doc_id")
  }

  private val exactOracle =
    """SELECT doc_id, content_hash
      |FROM (SELECT doc_id, md5(text) AS content_hash,
      |             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |      FROM documents)
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** X2: MinHash+LSH near-dup pairs, Jaccard >= 0.5 verified on the true
    * shingle sets. Pipeline: shingle → 12 minhashes → 4 band buckets →
    * bucket self-join (candidates) → exact verify. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", tokenShingles($"text").as("shingles"))
    val cand = Dedup.lshCandidates(base, "doc_id", "shingles", numHashes = 12, rowsPerBand = 3)
    val pairs = cand
      .join(base.select($"doc_id".as("a"), $"shingles".as("sa")), "a")
      .join(base.select($"doc_id".as("b"), $"shingles".as("sb")), "b")
    // fence: keep the merge-walk jaccard from being re-inlined into the
    // pushed-down filter (would double the per-pair cost).
    pairs
      .select($"a", $"b", QueryUtil.fence(halfUp4(Dedup.jaccardSorted($"sa", $"sb"))).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy("a", "b")
  }

  /** Shared oracle prefix (shingles → signature → bands → skew-pruned):
    * everything up to BUT NOT including candidate pairing, so both the
    * self-join (x11/x14) and the cross-set join (x17) build on the same
    * banding. `tInnerExtra`/`tOuterExtra` thread extra columns through the
    * `t` CTE (e.g. the source-number split for x17). */
  private def minhashBandCtes(withKeyword: String,
                              tInnerExtra: String = "",
                              tOuterExtra: String = ""): String = {
    val mh = (0 until 12).map(j =>
      s"list_aggregate(list_transform(shingles, s -> md5('$j:' || s)), 'min') AS mh$j").mkString(",\n       ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', mh${3 * b}, mh${3 * b + 1}, mh${3 * b + 2})) AS bh FROM sig")
      .mkString("\n       UNION ALL ")
    s"""$withKeyword t AS (SELECT doc_id$tOuterExtra, $shinglesSql AS shingles
       |           FROM (SELECT doc_id$tInnerExtra, text, string_split(text, ' ') AS toks FROM documents)),
       |sig AS (SELECT doc_id, shingles,
       |       $mh
       |       FROM t),
       |bands AS (
       |       $bands),
       |bands_pruned AS (SELECT doc_id, band, bh
       |                 FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS bn FROM bands)
       |                 WHERE bn <= ${Dedup.DefaultMaxBucket}),
       |""".stripMargin
  }

  /** Shared oracle CTE chain (shingles → signature → bands → skew-pruned →
    * candidates → verified jaccard), reused by the pair query and the
    * clustering oracle. */
  private[queries] def minhashCtes(withKeyword: String): String =
    minhashBandCtes(withKeyword) +
      """cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bands_pruned x JOIN bands_pruned y
       |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |pairs AS (SELECT a, b, ta.shingles AS sa, tb.shingles AS sb
       |          FROM cand JOIN t ta ON ta.doc_id = a JOIN t tb ON tb.doc_id = b),
       |j AS (SELECT a, b,
       |        floor((CAST(len(list_filter(sa, s -> list_contains(sb, s))) AS DOUBLE)
       |              / (len(sa) + len(sb) - len(list_filter(sa, s -> list_contains(sb, s))))) * 10000 + 0.5) / 10000.0 AS jaccard
       |      FROM pairs)
       |""".stripMargin

  private val minhashOracle =
    minhashCtes("WITH") +
      """SELECT a, b, jaccard FROM j
        |WHERE jaccard >= 0.5
        |ORDER BY a, b""".stripMargin

  /** X2 near-dup → dedup groups: connected components over the verified
    * near-dup pairs; every doc gets the min doc_id of its component as
    * cluster id, the representative flagged canonical. Spark: large-star/
    * small-star alternation (Components.connectedComponentsStars — the
    * billion-edge-scale algorithm, promoted to the production path in
    * round 8; the min-label + pointer-jumping loop remains available);
    * oracle: recursive-CTE transitive closure — independent algorithms,
    * same fixpoint. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = minhashLsh(spark, dir).select($"a", $"b")
    val nodes = Tables.documents(spark, dir).select($"doc_id")
    graft.operators.Components.connectedComponentsStars(spark, nodes, pairs, "doc_id")
      .select($"doc_id", $"component".as("cluster_id"),
        ($"doc_id" === $"component").cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** x101: duplication-inflation report — the per-source governance view of
    * x14's clusters: how many documents each source contributed, how many
    * DISTINCT content clusters they collapse to, the inflation factor
    * docs/clusters (1.0 = no duplication; the multiplier a dedup pass
    * recovers), and the largest cluster any of the source's docs belongs
    * to (template-farm detector). Exact integer counts; one division.
    * Scale: the cluster labeling is x14's audited components pipeline;
    * the rollup is one join + a |sources|-group aggregate. */
  def dupStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cl = dedupClusters(spark, dir).select($"doc_id", $"cluster_id")
    val csize = cl.groupBy($"cluster_id").agg(count(lit(1)).as("csize"))
    cl.join(Tables.documents(spark, dir).select($"doc_id", $"source"), "doc_id")
      .join(csize, "cluster_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"cluster_id").as("n_clusters"),
        max($"csize").as("max_cluster"))
      .select($"source", $"n_docs", $"n_clusters",
        halfUp4($"n_docs".cast("double") / $"n_clusters".cast("double"))
          .as("inflation"),
        $"max_cluster")
      .orderBy("source")
  }

  private lazy val dupStatsOracle =
    clustersOracleCtes +
      """, cs AS (SELECT cluster_id, count(*) AS csize FROM labeled GROUP BY cluster_id)
        |SELECT d.source, count(*) AS n_docs,
        |       count(DISTINCT l.cluster_id) AS n_clusters,
        |       floor((CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT l.cluster_id) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS inflation,
        |       CAST(max(cs.csize) AS BIGINT) AS max_cluster
        |FROM labeled l
        |JOIN documents d ON d.doc_id = l.doc_id
        |JOIN cs ON cs.cluster_id = l.cluster_id
        |GROUP BY d.source
        |ORDER BY d.source""".stripMargin

  /** Cluster-labeling CTE chain ending in `labeled(doc_id, cluster_id,
    * is_canonical)` — shared by the x14 oracle and x27's weighting. */
  private[queries] def clustersOracleCtes: String =
    minhashCtes("WITH RECURSIVE") +
      """, pairs2 AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
        |edges AS (SELECT a AS src, b AS dst FROM pairs2 UNION ALL SELECT b AS src, a AS dst FROM pairs2),
        |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
        |          UNION
        |          SELECT e.src AS id, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.id),
        |labeled AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
        |              CAST(min(r) = id AS INTEGER) AS is_canonical
        |            FROM reach GROUP BY id)""".stripMargin

  private val clustersOracle =
    clustersOracleCtes +
      """
        |SELECT doc_id, cluster_id, is_canonical
        |FROM labeled
        |ORDER BY doc_id""".stripMargin

  /** X2 variant: 32-bit SimHash over distinct tokens; docs in the same
    * SimHash bucket are near-dup candidates, verified by token-set Jaccard. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", TextAnalysis.tokenSet($"text").as("toks"))
      .select($"doc_id", $"toks", Dedup.simhashBits($"toks", 32).as("simhash"))
    // skew guard, mirrored in the oracle: a degenerate bucket of m equal
    // signatures contributes m² pairs — same shared cap as the LSH bands
    val capped = Dedup.capBuckets(base, Seq("simhash"), Dedup.DefaultMaxBucket)
    val withN = capped.withColumn("nt", size($"toks"))
    val l = withN.select($"doc_id".as("a"), $"toks".as("ta"), $"simhash", $"nt".as("na"))
    val r = withN.select($"doc_id".as("b"), $"toks".as("tb"), $"simhash", $"nt".as("nb"))
    // Exact prefilter (implied by RAW jaccard >= 0.5): 2*min(|A|,|B|) >= max.
    // The final filter is on the raw jaccard so prefilter and threshold
    // can't diverge at a rounding boundary.
    l.join(r,
        l("simhash") === r("simhash") && $"a" < $"b" &&
          $"na" * 2 >= $"nb" && $"nb" * 2 >= $"na")
      .select($"a", $"b", l("simhash").as("simhash"),
        QueryUtil.fence(Dedup.jaccardSorted($"ta", $"tb")).as("jraw"))
      .filter($"jraw" >= 0.5)
      .select($"a", $"b", $"simhash", halfUp4($"jraw").as("jaccard"))
      .orderBy("a", "b")
  }

  private val simhashOracle = {
    val bitExprs = (0 until 32).map { p =>
      val nib = p / 4 + 1
      val shift = 3 - p % 4
      s"""CASE WHEN list_sum(list_transform(toks, t ->
         |  CASE WHEN ((strpos('0123456789abcdef', substr(md5(t), $nib, 1)) - 1) >> $shift) & 1 = 1
         |       THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" ||\n       ")
    s"""WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
       |s0 AS (SELECT doc_id, toks,
       |       $bitExprs AS simhash
       |      FROM t),
       |s AS (SELECT doc_id, toks, simhash
       |      FROM (SELECT *, count(*) OVER (PARTITION BY simhash) AS bn FROM s0)
       |      WHERE bn <= ${Dedup.DefaultMaxBucket}),
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b, x.simhash AS simhash, x.toks AS ta, y.toks AS tb
       |      FROM s x JOIN s y ON x.simhash = y.simhash AND x.doc_id < y.doc_id),
       |j AS (SELECT a, b, simhash,
       |        CAST(len(list_filter(ta, s -> list_contains(tb, s))) AS DOUBLE)
       |              / (len(ta) + len(tb) - len(list_filter(ta, s -> list_contains(tb, s)))) AS jraw
       |      FROM p)
       |SELECT a, b, simhash, floor(jraw * 10000 + 0.5) / 10000.0 AS jaccard FROM j
       |WHERE jraw >= 0.5
       |ORDER BY a, b""".stripMargin
  }

  /** X2 variant: character-trigram Jaccard near-dups, LSH-blocked. Grams
    * are long-packed trigrams (charNgramLongs); candidates come from the
    * multiplicative-minhash band join (8 hashes × 2 rows/band → band
    * collision prob J² per band, ~0.98 recall at J=0.8), verified with the
    * O(n+m) long merge walk. Subquadratic at any scale — the earlier
    * source-blocked form was O(block²) (622k same-source pairs at sf0.1).
    * The oracle reproduces packing, hash family, banding, skew cap, and
    * verification with plain integer SQL, so both engines see the identical
    * candidate set. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .select($"doc_id", TextAnalysis.charNgramLongs($"text", 3).as("g3"))
      .withColumn("n3", size($"g3"))
    val cand = Dedup.lshCandidatesLong(g, "doc_id", "g3", numHashes = 8, rowsPerBand = 2)
    // Exact size prefilter (implied by raw J >= 0.8: min/max >= 0.8, integer
    // form 5*min >= 4*max) evaluated BEFORE the merge walk; the final filter
    // is on the RAW jaccard so prefilter and threshold share one grid.
    cand
      .join(g.select($"doc_id".as("a"), $"g3".as("ga"), $"n3".as("na")), "a")
      .join(g.select($"doc_id".as("b"), $"g3".as("gb"), $"n3".as("nb")), "b")
      .filter($"na" * 5 >= $"nb" * 4 && $"nb" * 5 >= $"na" * 4)
      .select($"a", $"b", QueryUtil.fence(Dedup.jaccardSortedLong($"ga", $"gb")).as("jraw"))
      .filter($"jraw" >= 0.8)
      .select($"a", $"b", halfUp4($"jraw").as("jaccard"))
      .orderBy("a", "b")
  }

  /** Oracle mirror of ngramJaccard: same 16-bit-per-char packing (unicode
    * code point == UTF-16 unit for BMP), same LongMinHash constants (shared
    * via graft.functions.LongMinHash — implementation and oracle can't
    * drift), same banding, skew cap, prefilter, and raw-threshold verify. */
  private val ngramOracle = {
    import graft.functions.LongMinHash
    val P = LongMinHash.P
    val k = 8; val rpb = 2
    def ch(off: Int) =
      s"(CASE WHEN i + $off <= length(text) THEN unicode(substr(text, CAST(i + $off AS INTEGER), 1)) ELSE 0 END)"
    val pack = s"${ch(0)} * 4294967296 + ${ch(1)} * 65536 + ${ch(2)}"
    val mh = (0 until k).map(j =>
      s"coalesce(list_min(list_transform(g3, v -> (${LongMinHash.a(j)} * (v % $P) + ${LongMinHash.b(j)}) % $P)), $P) AS mh$j")
      .mkString(",\n       ")
    val bands = (0 until k / rpb).map(b =>
      s"SELECT doc_id, $b AS band, mh${rpb * b} * ${LongMinHash.BandMult} + mh${rpb * b + 1} AS bh FROM sig")
      .mkString("\n       UNION ALL ")
    s"""WITH g AS (SELECT doc_id,
       |             list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
       |                                          i -> $pack)) AS g3
       |           FROM documents),
       |sig AS (SELECT doc_id,
       |       $mh
       |       FROM g),
       |bands AS (
       |       $bands),
       |bands_pruned AS (SELECT doc_id, band, bh
       |                 FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS bn FROM bands)
       |                 WHERE bn <= ${Dedup.DefaultMaxBucket}),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bands_pruned x JOIN bands_pruned y
       |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |pairs AS (SELECT a, b, ga.g3 AS ga, gb.g3 AS gb
       |          FROM cand JOIN g ga ON ga.doc_id = a JOIN g gb ON gb.doc_id = b
       |          WHERE len(ga.g3) * 5 >= len(gb.g3) * 4 AND len(gb.g3) * 5 >= len(ga.g3) * 4),
       |j AS (SELECT a, b,
       |        CAST(len(list_filter(ga, s -> list_contains(gb, s))) AS DOUBLE)
       |              / (len(ga) + len(gb) - len(list_filter(ga, s -> list_contains(gb, s)))) AS jraw
       |      FROM pairs)
       |SELECT a, b, floor(jraw * 10000 + 0.5) / 10000.0 AS jaccard FROM j
       |WHERE jraw >= 0.8
       |ORDER BY a, b""".stripMargin
  }

  /** SemDeDup cosine threshold: within a cluster, a vector with a lower-id
    * neighbor at cosine >= this is dropped. Tuned to the synthetic fixture
    * (near-isotropic unit vectors — real text embeddings concentrate much
    * higher, where the standard ~0.95+ thresholds apply); drops 8/14/78
    * docs at sf0.001/0.01/0.1, so the gate is exercised at every SF. */
  private val SemTau = 0.42

  /** x15 trains the clustering for this many Lloyd iterations. */
  private val SemTrainIters = 1

  /** X2 (semantic): SemDeDup-style embedding dedup — k-means-cluster the
    * corpus embeddings (Lloyd-TRAINED centroids, the x35 fixed-point
    * hash-stable trainer), then compare pairs only WITHIN a cluster and
    * drop every vector that has a lower-id cluster-mate at cosine >=
    * [[SemTau]] (min-id survivor, the house dedup rule). This is the
    * semantic member of the near-dup family: x11/x13 catch lexical
    * overlap, x12 catches token-frequency overlap, x32 catches raw
    * embedding collisions — SemDeDup catches paraphrases that share no
    * surface form, at quadratic cost bounded by the CLUSTER, not the
    * corpus. 100 TB: choose k ∝ n so cluster size stays constant; the
    * pairwise stage is one shuffle keyed on cent_id with per-cluster
    * work O(size²) — no all-pairs join anywhere; cosines compared
    * UNROUNDED (identical IEEE doubles both engines, x32 precedent).
    * Ref semantics: SemDeDup (Abbas et al. 2023), re-expressed as
    * declarative Spark. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Similarity.norm($"embedding").as("nrm"))
    val seed = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"), $"nrm".as("cn"))
    val cents = Similarity.refineCentroids(emb, seed, iters = SemTrainIters)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"nrm", $"cent_id",
        (Similarity.dot($"embedding", $"cv") / ($"nrm" * $"cn")).as("ccos"))
      .withColumn("arn", row_number().over(wAssign)).filter($"arn" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"cent_id")
    val mates = assigned.select($"cent_id", $"vec_id".as("b_id"),
      $"embedding".as("bv"), $"nrm".as("bn"))
    val dropped = assigned.join(mates, Seq("cent_id"))
      .filter($"vec_id" > $"b_id" &&
        Similarity.dot($"embedding", $"bv") / ($"nrm" * $"bn") >= SemTau)
      .select($"vec_id").distinct().withColumn("dup", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select($"vec_id", $"cent_id", $"dup".isNull.as("keep"))
      .orderBy("vec_id")
  }

  private val semanticOracle = {
    import SimilarityQueries.{assignSql, dotSql, ivfSeedSql, trainIterSql}
    val iters = (0 until SemTrainIters)
      .map(k => trainIterSql(s"c$k", s"c${k + 1}")).mkString(",\n")
    s"""WITH $ivfSeedSql,
       |c0 AS (SELECT * FROM c),
       |$iters,
       |${assignSql(s"c$SemTrainIters")},
       |dup AS (SELECT DISTINCT a.vec_id
       |        FROM assigned a JOIN assigned b
       |          ON a.cent_id = b.cent_id AND a.vec_id > b.vec_id
       |        WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $SemTau)
       |SELECT s.vec_id, s.cent_id, (d.vec_id IS NULL) AS keep
       |FROM assigned s LEFT JOIN dup d ON s.vec_id = d.vec_id
       |ORDER BY s.vec_id""".stripMargin
  }

  /** x17: continual-ingestion admission gate — dedup a NEW batch (sources
    * src10..src19) against the EXISTING corpus (src0..src9), the shape a
    * production pipeline runs on every intake (the reference's
    * incremental-vs-existing anti-join at `salesforce_extractor.py:213-217`,
    * lifted from exact hash equality to near-dup semantics):
    *
    *   1. exact gate — new doc's md5(text) already present in the corpus,
    *   2. near-dup gate — x11's MinHash banding, but joined NEW × EXISTING
    *      instead of self-joined, Jaccard >= 0.5 verified,
    *
    * each rejected doc reporting its earliest corpus duplicate. New-vs-new
    * duplicates are deliberately NOT flagged (in-batch dedup is x10/x11's
    * job — this gate answers "is it already in the corpus"). Scale: the
    * band bucket cap is shared with x11; the cross-set band join only
    * pairs new against existing, so intake cost scales with the BATCH,
    * not the corpus (bands of the corpus are precomputable/persistable —
    * the PLANS.md shared-candidate note). */
  def incrementalNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", substring($"source", 4, 10).cast("int").as("snum"))
    val exHash = docs.filter($"snum" < 10)
      .groupBy(md5($"text").as("content_hash")).agg(min($"doc_id").as("exact_of"))
    val exactFlag = docs.filter($"snum" >= 10)
      .select($"doc_id", md5($"text").as("content_hash"))
      .join(exHash, Seq("content_hash"), "left")
    val base = docs.select($"doc_id", $"snum", tokenShingles($"text").as("shingles"))
    val banded = base.select($"doc_id", $"snum",
      posexplode(call_function("minhash_bands", $"shingles", lit(12), lit(3)))
        .as(Seq("band", "bh")))
    val pruned = Dedup.capBuckets(banded, Seq("band", "bh"), Dedup.DefaultMaxBucket)
    val cand = pruned.filter($"snum" >= 10).select($"doc_id".as("a"), $"band", $"bh")
      .join(pruned.filter($"snum" < 10).select($"doc_id".as("b"), $"band", $"bh"),
        Seq("band", "bh"))
      .select($"a", $"b").distinct()
    val nearOf = cand
      .join(base.select($"doc_id".as("a"), $"shingles".as("sa")), "a")
      .join(base.select($"doc_id".as("b"), $"shingles".as("sb")), "b")
      .select($"a", $"b",
        QueryUtil.fence(halfUp4(Dedup.jaccardSorted($"sa", $"sb"))).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .groupBy($"a").agg(min($"b").as("near_of"))
    exactFlag.join(nearOf, $"doc_id" === $"a", "left")
      .select($"doc_id",
        when($"exact_of".isNotNull, "dup_exact")
          .when($"near_of".isNotNull, "near_dup")
          .otherwise("admit").as("verdict"),
        coalesce($"exact_of", $"near_of").as("dup_of"))
      .orderBy("doc_id")
  }

  private val incrementalOracle = {
    val snumSql = "TRY_CAST(substr(source, 4, 10) AS INTEGER)"
    minhashBandCtes("WITH", s", $snumSql AS snum", ", snum") +
      s"""cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM bands_pruned x JOIN t tx ON tx.doc_id = x.doc_id AND tx.snum >= 10
         |         JOIN bands_pruned y ON x.band = y.band AND x.bh = y.bh
         |         JOIN t ty ON ty.doc_id = y.doc_id AND ty.snum < 10),
         |pairs AS (SELECT a, b, ta.shingles AS sa, tb.shingles AS sb
         |          FROM cand JOIN t ta ON ta.doc_id = a JOIN t tb ON tb.doc_id = b),
         |j AS (SELECT a, b,
         |        floor((CAST(len(list_filter(sa, s -> list_contains(sb, s))) AS DOUBLE)
         |              / (len(sa) + len(sb) - len(list_filter(sa, s -> list_contains(sb, s))))) * 10000 + 0.5) / 10000.0 AS jaccard
         |      FROM pairs),
         |nearof AS (SELECT a, min(b) AS near_of FROM j WHERE jaccard >= 0.5 GROUP BY a),
         |exact AS (SELECT n.doc_id, min(e.doc_id) AS exact_of
         |          FROM (SELECT doc_id, md5(text) AS h FROM documents WHERE $snumSql >= 10) n
         |          JOIN (SELECT doc_id, md5(text) AS h FROM documents WHERE $snumSql < 10) e
         |            ON n.h = e.h
         |          GROUP BY n.doc_id)
         |SELECT nd.doc_id,
         |       CASE WHEN ex.exact_of IS NOT NULL THEN 'dup_exact'
         |            WHEN nr.near_of IS NOT NULL THEN 'near_dup'
         |            ELSE 'admit' END AS verdict,
         |       COALESCE(ex.exact_of, nr.near_of) AS dup_of
         |FROM (SELECT doc_id FROM t WHERE snum >= 10) nd
         |LEFT JOIN exact ex ON ex.doc_id = nd.doc_id
         |LEFT JOIN nearof nr ON nr.a = nd.doc_id
         |ORDER BY nd.doc_id""".stripMargin
  }

  /** x18 Jaccard threshold τ = 1/2 (x11's near-dup regime) — kept as a
    * ratio so the verify predicate is pure integer arithmetic. */
  private[queries] val SetJoinTauNum = 1
  private[queries] val SetJoinTauDen = 2

  /** x18: EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family) — every pair of documents whose 3-token
    * SHINGLE sets have Jaccard ≥ τ, with NO LSH approximation (x11 finds
    * the same regime probabilistically; this is the exact counterpart,
    * and their survivor sets can be diffed). Shingles are globally
    * ordered rarest-first (ascending document frequency, then shingle);
    * a set of n shingles indexes only its first n − ⌈τ·n⌉ + 1 (= ⌊n/2⌋+1
    * at τ=1/2) elements — the PREFIX — and two sets with J ≥ τ must
    * share a prefix element, so candidates come from an equi-join on
    * rare-element postings only. Everything is integer-exact: the prefix
    * length is integer arithmetic, and J = o/(na+nb−o) ≥ 1/2
    * cross-multiplies to the verify predicate 3·o ≥ na+nb — no doubles
    * anywhere but the reported ratio.
    * Exactness is property-proven against a quadratic reference
    * on random corpora (PropertySpec); the DuckDB oracle mirrors the
    * same pruning for engine parity (a full quadratic oracle would be
    * O(|corpus|²) list intersections in a single DuckDB thread at
    * sf0.1). Scale: df is a vocab-sized broadcast; prefix postings are
    * short BECAUSE they are the rarest elements (no bucket cap needed —
    * capping would break exactness; a degenerate corpus where rare
    * shingles still carry huge postings is near-duplicate-saturated and
    * belongs in x55 chunk dedup first). */
  def setJoinPrefix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", tokenShingles($"text").as("sh"))
    setJoinPrefixOn(base)
  }

  /** The x18 pipeline over any (doc_id, sh: sorted-distinct array)
    * frame — split out so PropertySpec can drive random corpora through
    * the EXACT same plan. */
  private[graft] def setJoinPrefixOn(base: org.apache.spark.sql.DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    // NO reuse-point repartition here, deliberately (the x16 trick was
    // measured: 3.3 s → 4.2 s at sf0.1): `base` carries the full shingle
    // ARRAYS, so exchanging it costs more than re-running the narrow
    // per-row shingle build per consumer. The x16 frame is (long, long)
    // rows — that is what makes its exchange cheaper than recompute.
    val e = base.select($"doc_id", explode($"sh").as("g"))
    val dfreq = e.groupBy($"g").agg(count(lit(1)).as("df"))
    val ordered = e.join(broadcast(dfreq), "g")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"g"))).as("ord"))
      .select($"doc_id", transform($"ord", x => x.getField("g")).as("og"),
        size($"ord").as("n"))
    // p = n − ⌈τ·n⌉ + 1 = ⌊n/2⌋ + 1 at τ = 1/2, in integer arithmetic
    val pref = ordered
      .select($"doc_id", explode(slice($"og", lit(1), expr("n div 2 + 1"))).as("g"))
    val cand = pref.select($"doc_id".as("a"), $"g")
      .join(pref.select($"doc_id".as("b"), $"g"), Seq("g"))
      .filter($"a" < $"b").select($"a", $"b").distinct()
    cand
      .join(base.select($"doc_id".as("a"), $"sh".as("sa")), "a")
      .join(base.select($"doc_id".as("b"), $"sh".as("sb")), "b")
      .select($"a", $"b",
        QueryUtil.fence(call_function("sorted_intersect_count", $"sa", $"sb")
          .cast("long")).as("inter"),
        size($"sa").cast("long").as("na"), size($"sb").cast("long").as("nb"))
      .filter($"inter" * (SetJoinTauDen + SetJoinTauNum) >=
        lit(SetJoinTauNum) * ($"na" + $"nb"))
      .select($"a", $"b", $"inter", ($"na" + $"nb" - $"inter").as("un"),
        halfUp4($"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double")).as("j4"))
      .orderBy("a", "b")
  }

  /** Oracle: the same rarest-first prefix pruning in SQL (exactness
    * itself is property-proven; this checks engine parity of ordering,
    * prefix math, and the integer threshold). */
  private val setJoinOracle =
    s"""WITH t AS (SELECT doc_id, $shinglesSql AS sh
       |           FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)),
       |e AS (SELECT doc_id, unnest(sh) AS g FROM t),
       |dfq AS (SELECT g, count(*) AS df FROM e GROUP BY g),
       |ord AS (SELECT e.doc_id, list(e.g ORDER BY dfq.df, e.g) AS og, count(*) AS n
       |        FROM e JOIN dfq ON e.g = dfq.g
       |        GROUP BY e.doc_id),
       |pr AS (SELECT doc_id, unnest(list_slice(og, 1, CAST(n // 2 + 1 AS INTEGER))) AS g FROM ord),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM pr x JOIN pr y ON x.g = y.g AND x.doc_id < y.doc_id),
       |v AS (SELECT a, b,
       |        CAST(len(list_filter(ta.sh, s -> list_contains(tb.sh, s))) AS BIGINT) AS inter,
       |        CAST(len(ta.sh) AS BIGINT) AS na, CAST(len(tb.sh) AS BIGINT) AS nb
       |      FROM cand JOIN t ta ON ta.doc_id = a JOIN t tb ON tb.doc_id = b)
       |SELECT a, b, inter, na + nb - inter AS un,
       |       floor((CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS j4
       |FROM v
       |WHERE ${SetJoinTauDen + SetJoinTauNum} * inter >= $SetJoinTauNum * (na + nb)
       |ORDER BY a, b""".stripMargin

  /** x19: contrastive TRIPLET mining — turn the near-dup graph into
    * (anchor, positive, negative) training examples for embedding /
    * retrieval models: every doc with a verified near-duplicate anchors a
    * triplet, its min-id near-dup is the positive, and the negative is a
    * deterministic pseudo-random non-member (min salted md5 over the rest
    * of the corpus — reproducible across engines/reruns, unlike rand()
    * negatives, and re-salting gives fresh negatives per epoch). Scale:
    * positives ride the already-audited x11 LSH shape; negatives are a
    * broadcast of the (tiny) anchor set against one corpus scan with a
    * per-anchor WindowGroupLimit — random negative sampling without a
    * shuffle of the corpus. */
  def tripletMining(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pos = minhashLsh(spark, dir)
      .groupBy($"a".as("anchor")).agg(min($"b").as("positive"))
    val docs = Tables.documents(spark, dir).select($"doc_id")
    val wNeg = Window.partitionBy($"anchor").orderBy($"nh", $"doc_id")
    docs.join(broadcast(pos), $"doc_id" =!= $"anchor" && $"doc_id" =!= $"positive")
      .withColumn("nh", md5(concat_ws("|", lit("neg"), $"anchor", $"doc_id")))
      .withColumn("rn", row_number().over(wNeg)).filter($"rn" === 1)
      .select($"anchor", $"positive", $"doc_id".as("negative"))
      .orderBy("anchor")
  }

  private val tripletOracle =
    minhashCtes("WITH") +
      """, pos AS (SELECT a AS anchor, min(b) AS positive
        |       FROM j WHERE jaccard >= 0.5 GROUP BY a),
        |neg AS (SELECT anchor, positive, doc_id AS negative,
        |          row_number() OVER (PARTITION BY anchor
        |            ORDER BY md5(concat_ws('|', 'neg', CAST(anchor AS VARCHAR), CAST(doc_id AS VARCHAR))), doc_id) AS rn
        |        FROM pos JOIN documents d
        |          ON d.doc_id <> pos.anchor AND d.doc_id <> pos.positive)
        |SELECT anchor, positive, negative
        |FROM neg WHERE rn = 1
        |ORDER BY anchor""".stripMargin

  /** x26: recall/precision audit of the APPROXIMATE near-dup path against
    * the EXACT one, in-engine and oracle-paired: x11's MinHash-LSH pairs
    * (probabilistic candidates, halfUp4-rounded jaccard ≥ 0.5) diffed
    * against x18's prefix-filter join (exact, unrounded 3·o ≥ na+nb).
    * Emits the pair counts, overlap, and both ratios — the measurement a
    * production dedup pipeline publishes next to its outputs. The two
    * definitions differ exactly at the τ rounding boundary, so
    * lsh_only/exact_only are NOT symmetric noise: boundary pairs
    * (j ∈ [0.49995, 0.5)) appear only on the LSH side, genuinely missed
    * pairs only on the exact side. Scale: runs both audited pipelines
    * once each and joins K-sized pair sets. */
  def lshRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lsh = minhashLsh(spark, dir).select($"a", $"b", lit(1).as("in_lsh"))
    val exact = setJoinPrefix(spark, dir).select($"a", $"b", lit(1).as("in_exact"))
    lsh.join(exact, Seq("a", "b"), "full")
      .agg(
        sum(coalesce($"in_exact", lit(0))).cast("long").as("n_exact"),
        sum(coalesce($"in_lsh", lit(0))).cast("long").as("n_lsh"),
        sum(when($"in_lsh".isNotNull && $"in_exact".isNotNull, 1).otherwise(0))
          .cast("long").as("n_common"))
      .select($"n_exact", $"n_lsh", $"n_common",
        halfUp4($"n_common".cast("double") / $"n_exact".cast("double")).as("recall4"),
        halfUp4($"n_common".cast("double") / $"n_lsh".cast("double")).as("precision4"))
  }

  /** x18's prefix chain re-rendered with `px`-prefixed CTE names so it can
    * share one WITH clause with [[minhashCtes]] (both use t/cand/...). */
  private def prefixChainCtes: String =
    s"""pxe AS (SELECT doc_id, unnest(shingles) AS g FROM t),
       |pxdf AS (SELECT g, count(*) AS df FROM pxe GROUP BY g),
       |pxord AS (SELECT pxe.doc_id, list(pxe.g ORDER BY pxdf.df, pxe.g) AS og, count(*) AS n
       |          FROM pxe JOIN pxdf ON pxe.g = pxdf.g
       |          GROUP BY pxe.doc_id),
       |pxpr AS (SELECT doc_id, unnest(list_slice(og, 1, CAST(n // 2 + 1 AS INTEGER))) AS g FROM pxord),
       |pxcand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |           FROM pxpr x JOIN pxpr y ON x.g = y.g AND x.doc_id < y.doc_id),
       |pxv AS (SELECT a, b,
       |          CAST(len(list_filter(ta.shingles, s -> list_contains(tb.shingles, s))) AS BIGINT) AS inter,
       |          CAST(len(ta.shingles) AS BIGINT) AS na, CAST(len(tb.shingles) AS BIGINT) AS nb
       |        FROM pxcand JOIN t ta ON ta.doc_id = a JOIN t tb ON tb.doc_id = b),
       |pxpairs AS (SELECT a, b FROM pxv
       |            WHERE ${SetJoinTauDen + SetJoinTauNum} * inter >= $SetJoinTauNum * (na + nb))""".stripMargin

  private val lshRecallOracle =
    minhashCtes("WITH") +
      s""", lshp AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
         |$prefixChainCtes,
         |m AS (SELECT coalesce(l.a, p.a) AS a, coalesce(l.b, p.b) AS b,
         |        (l.a IS NOT NULL) AS in_lsh, (p.a IS NOT NULL) AS in_exact
         |      FROM lshp l FULL JOIN pxpairs p ON l.a = p.a AND l.b = p.b)
         |SELECT CAST(sum(CASE WHEN in_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |       CAST(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
         |       CAST(sum(CASE WHEN in_lsh AND in_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         |       floor((CAST(sum(CASE WHEN in_lsh AND in_exact THEN 1 ELSE 0 END) AS DOUBLE)
         |              / sum(CASE WHEN in_exact THEN 1 ELSE 0 END)) * 10000 + 0.5) / 10000.0 AS recall4,
         |       floor((CAST(sum(CASE WHEN in_lsh AND in_exact THEN 1 ELSE 0 END) AS DOUBLE)
         |              / sum(CASE WHEN in_lsh THEN 1 ELSE 0 END)) * 10000 + 0.5) / 10000.0 AS precision4
         |FROM m""".stripMargin

  /** Containment threshold for x25 (kept rational: 4/5). */
  private val ContainTauNum = 4
  private val ContainTauDen = 5

  /** x25: asymmetric CONTAINMENT near-dup detection — pairs where ≥ 80%
    * of the smaller document's shingles appear in the larger one
    * (|Sa∩Sb| / min(|Sa|,|Sb|) ≥ 4/5): catches excerpt/quote/
    * superset relationships that symmetric Jaccard misses entirely (a
    * 10-shingle quote inside a 100-shingle doc has J ≈ 0.1 but
    * containment 1.0). Candidates reuse x11's MinHash banding (high
    * containment of the small side still collides its minima often);
    * the verify is the integer predicate 5·inter ≥ 4·min(na,nb) — no
    * doubles except the reported ratio. Emits (contained, container) by
    * size with deterministic orientation. Note the LSH candidate step
    * makes this the APPROXIMATE containment path (very asymmetric sizes
    * lower band-collision odds — the x18-style exact prefix join is the
    * exact counterpart when needed). */
  def containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", tokenShingles($"text").as("shingles"))
    val cand = Dedup.lshCandidates(base, "doc_id", "shingles", numHashes = 12, rowsPerBand = 3)
    cand
      .join(base.select($"doc_id".as("a"), $"shingles".as("sa")), "a")
      .join(base.select($"doc_id".as("b"), $"shingles".as("sb")), "b")
      .select($"a", $"b",
        QueryUtil.fence(call_function("sorted_intersect_count", $"sa", $"sb")
          .cast("long")).as("inter"),
        size($"sa").cast("long").as("na"), size($"sb").cast("long").as("nb"))
      .filter($"inter" * ContainTauDen >= lit(ContainTauNum) * least($"na", $"nb"))
      .select(
        when($"na" <= $"nb", $"a").otherwise($"b").as("contained"),
        when($"na" <= $"nb", $"b").otherwise($"a").as("container"),
        least($"na", $"nb").as("n_small"),
        halfUp4($"inter".cast("double") / least($"na", $"nb").cast("double")).as("cont4"))
      .orderBy("contained", "container")
  }

  private val containmentOracle =
    minhashCtes("WITH") +
      s""", cont AS (SELECT a, b,
         |        CAST(len(list_filter(sa, s -> list_contains(sb, s))) AS BIGINT) AS inter,
         |        CAST(len(sa) AS BIGINT) AS na, CAST(len(sb) AS BIGINT) AS nb
         |      FROM pairs)
         |SELECT CASE WHEN na <= nb THEN a ELSE b END AS contained,
         |       CASE WHEN na <= nb THEN b ELSE a END AS container,
         |       least(na, nb) AS n_small,
         |       floor((CAST(inter AS DOUBLE) / CAST(least(na, nb) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS cont4
         |FROM cont
         |WHERE inter * $ContainTauDen >= $ContainTauNum * least(na, nb)
         |ORDER BY contained, container""".stripMargin

  /** x27: SOFT dedup — down-weight near-duplicates instead of dropping
    * them (the SoftDeDup idea: duplicated content carries information
    * about frequency; deleting it biases the distribution, so each
    * member of a near-dup cluster trains at weight 1/cluster_size and
    * every cluster contributes exactly one document's worth of mass).
    * Clusters are x14's connected components; the weight is the exact
    * rational 1/size (identical doubles both engines), rounded only for
    * display. Scale: x14's audited shape + one count window on the
    * (small) cluster id. */
  def softDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"cluster_id")
    dedupClusters(spark, dir)
      .withColumn("csize", count(lit(1)).over(w).cast("int"))
      .select($"doc_id", $"cluster_id", $"csize",
        halfUp4(lit(1.0) / $"csize".cast("double")).as("weight4"))
      .orderBy("doc_id")
  }

  private val softDedupOracle =
    clustersOracleCtes +
      """, sized AS (SELECT doc_id, cluster_id, is_canonical,
        |        CAST(count(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS csize
        |      FROM labeled)
        |SELECT doc_id, cluster_id, csize,
        |       floor((1.0 / CAST(csize AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS weight4
        |FROM sized
        |ORDER BY doc_id""".stripMargin

  /** x29: sorted-neighborhood blocking (Hernández & Stolfo's merge/purge)
    * — the third candidate-generation family after hash-bucket LSH
    * (x11/x12) and prefix filtering (x18). Records sort by a blocking key
    * (first 12 chars) within each lang block; candidates are pairs within
    * rank distance ≤ 3 of the sorted order; the verify gate is exact
    * distinct-token Jaccard ≥ 0.8 decided on the cross-multiplied integer
    * predicate `it*5 >= un*4` (no float threshold). Scale (100 TB): the
    * neighbor join is an exact EQUI-join on (lang, rank) — each left row
    * explodes its 3 target ranks, so there is no per-block cross product;
    * the per-block `row_number` sort is the classic SN cost, and a hot
    * block sub-partitions by a longer key prefix (standard multi-pass SN).
    * The oracle expresses the same neighborhood as a rank-range join. */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        array_distinct(split($"text", " ")).as("toks"),
        substring($"text", 1, 12).as("bkey"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"lang").orderBy($"bkey", $"doc_id")))
    val l = keyed.select($"lang", $"rn", $"doc_id".as("doc_a"), $"toks".as("ta"))
      .withColumn("rn_r", explode(array($"rn" + 1, $"rn" + 2, $"rn" + 3)))
    val r = keyed.select($"lang", $"rn".as("rn_r"), $"doc_id".as("doc_b"), $"toks".as("tb"))
    l.join(r, Seq("lang", "rn_r"))
      .select($"doc_a", $"doc_b",
        size(array_intersect($"ta", $"tb")).as("it"),
        size(array_union($"ta", $"tb")).as("un"))
      .filter($"it" * 5 >= $"un" * 4)
      .select($"doc_a", $"doc_b", halfUp4($"it".cast("double") / $"un").as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val sortedNeighborhoodOracle =
    """WITH keyed AS MATERIALIZED (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY substr(text, 1, 12), doc_id) AS rn
      |  FROM documents),
      |cand AS (
      |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
      |         len(list_intersect(l.toks, r.toks)) AS it,
      |         len(list_distinct(list_concat(l.toks, r.toks))) AS un
      |  FROM keyed l JOIN keyed r
      |    ON l.lang = r.lang AND r.rn > l.rn AND r.rn <= l.rn + 3)
      |SELECT doc_a, doc_b, floor(CAST(it AS DOUBLE) / un * 10000 + 0.5) / 10000.0 AS jaccard
      |FROM cand WHERE it * 5 >= un * 4
      |ORDER BY doc_a, doc_b""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x29_sorted_neighborhood",
      "sorted-neighborhood blocking (merge/purge): per-lang sort-rank window W=3, exact-integer Jaccard>=0.8 gate",
      sortedNeighborhood, Some(sortedNeighborhoodOracle)),
    QueryDef("x27_soft_dedup", "soft dedup: 1/cluster-size training weights over near-dup components (X2)", softDedup, Some(softDedupOracle)),
    QueryDef("x25_containment", "asymmetric containment near-dups (excerpt detection), integer threshold (X2)", containment, Some(containmentOracle)),
    QueryDef("x26_lsh_recall_audit",
      "recall/precision of the MinHash-LSH path vs the exact prefix-filter join, in-engine (X2)",
      lshRecallAudit, Some(lshRecallOracle)),
    QueryDef("x19_triplet_mining", "contrastive (anchor, positive, negative) triplets from the near-dup graph (X2)", tripletMining, Some(tripletOracle)),
    QueryDef("x18_setjoin_prefix", "EXACT shingle-set similarity join via rarest-first prefix filtering (X2)", setJoinPrefix, Some(setJoinOracle)),
    QueryDef("x17_incremental_neardup", "corpus-vs-new-batch admission gate: exact + MinHash near-dup verdicts (X2)", incrementalNearDup, Some(incrementalOracle)),
    QueryDef("x10_exact_dedup", "exact content-hash dedup, deterministic survivor (X1)", exactDedup, Some(exactOracle)),
    QueryDef("x11_minhash_lsh", "MinHash+LSH near-dup pairs, Jaccard-verified (X2)", minhashLsh, Some(minhashOracle)),
    QueryDef("x12_simhash", "32-bit SimHash bucket near-dups (X2)", simhash, Some(simhashOracle)),
    QueryDef("x13_ngram_jaccard", "char-trigram Jaccard near-dups, LSH-blocked (X2)", ngramJaccard, Some(ngramOracle)),
    QueryDef("x14_dedup_clusters", "connected-component dedup groups over near-dup pairs (X2)", dedupClusters, Some(clustersOracle)),
    QueryDef("x101_dup_stats", "per-source duplication inflation report over the near-dup clusters (X2)", dupStats, Some(dupStatsOracle)),
    QueryDef("x15_semantic_dedup", "SemDeDup embedding dedup: trained k-means clusters, in-cluster cosine survivors (X2)", semanticDedup, Some(semanticOracle)))
}
