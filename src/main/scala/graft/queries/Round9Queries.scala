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

  /** Fold count for [[clusteredKfold]]. */
  private val KFolds = 5

  /** The x57 deterministic 16-bit hash, salted per use. */
  private def h16(salt: String, c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat_ws("|", lit(salt), c)), 1, 4), 16, 10).cast("long")

  private def h16Sql(salt: String, c: String): String = {
    val h = s"md5(concat_ws('|', '$salt', CAST($c AS VARCHAR)))"
    (1 to 4).map(i => s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)")
      .reduce((a, b) => s"($a * 16 + $b)")
  }

  /** x118: near-dup-aware k-fold assignment — cross-validation folds hashed
    * on the x14 dedup CLUSTER id, not the document id, so near-duplicate
    * documents can never straddle folds (train/test leakage through
    * paraphrases — the classic eval-inflation bug cluster-aware splitting
    * exists to kill). Per fold: document and cluster counts, plus the
    * measured leakage a NAIVE per-document hash split would have had on
    * this corpus (clusters whose members land in ≥2 folds under per-doc
    * hashing) — the quantified argument for the cluster-keyed variant.
    * Both fold hashes are the x57 16-bit md5 recipe (rerun/partitioning/
    * engine-stable). Scale: the cluster labeling is x14's audited
    * components pipeline; everything after is one |folds|-group aggregate
    * plus a cluster-count aggregate, with the 1-row leakage frame
    * broadcast onto the fold rows. */
  def clusteredKfold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cl = DedupQueries.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster_id")
    val folded = cl.select($"doc_id", $"cluster_id",
      (h16("fold", $"cluster_id") % KFolds).as("fold"),
      (h16("fold", $"doc_id") % KFolds).as("naive_fold"))
    val naiveLeaky = folded.groupBy($"cluster_id")
      .agg(countDistinct($"naive_fold").as("nf"))
      .agg(sum(when($"nf" > 1, 1L).otherwise(0L)).as("naive_leaky_clusters"))
    folded.groupBy($"fold")
      .agg(count(lit(1)).as("n_docs"), countDistinct($"cluster_id").as("n_clusters"))
      .crossJoin(broadcast(naiveLeaky))
      .select($"fold", $"n_docs", $"n_clusters", $"naive_leaky_clusters")
      .orderBy("fold")
  }

  private lazy val clusteredKfoldOracle =
    DedupQueries.clustersOracleCtes +
      s""", folded AS (SELECT doc_id, cluster_id,
         |    ${h16Sql("fold", "cluster_id")} % $KFolds AS fold,
         |    ${h16Sql("fold", "doc_id")} % $KFolds AS naive_fold
         |  FROM labeled),
         |leaky AS (SELECT CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS naive_leaky_clusters
         |          FROM (SELECT cluster_id, count(DISTINCT naive_fold) AS nf
         |                FROM folded GROUP BY cluster_id))
         |SELECT fold, count(*) AS n_docs,
         |       count(DISTINCT cluster_id) AS n_clusters,
         |       leaky.naive_leaky_clusters
         |FROM folded, leaky
         |GROUP BY fold, leaky.naive_leaky_clusters
         |ORDER BY fold""".stripMargin

  /** x120: BPE merge-round statistics — the tokenizer-induction aggregate:
    * weighted adjacent-character-pair counts over the corpus vocabulary
    * (pair count = Σ word_freq over each within-word adjacency position,
    * the quantity byte-pair encoding maximizes per merge), top-10 merge
    * candidates with the number of distinct word forms containing each.
    * Rank 1 IS the next BPE merge. Pair enumeration is ARRAY-LOCAL
    * (transform over sequence — the x20 recipe: zero shuffle to build
    * adjacencies); the only corpus-scale shuffle is the word-frequency
    * aggregate, and everything after is vocab-bounded. The final ranking
    * window is global but runs over the distinct-pair frame (≤ |alphabet|²
    * rows — the q62 documented-tiny single-partition sort). */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("wc"))
      .filter(length($"word") > 1)
    val pairs = words.select($"word", $"wc",
      explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
    val pc = pairs.groupBy($"pair")
      .agg(sum($"wc").as("n_occ"), countDistinct($"word").as("n_word_forms"))
    pc.withColumn("rk",
        row_number().over(Window.orderBy($"n_occ".desc, $"pair")))
      .filter($"rk" <= 10)
      .select($"rk", $"pair", $"n_occ", $"n_word_forms")
      .orderBy("rk")
  }

  private val bpePairsOracle =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |w AS (SELECT word, count(*) AS wc FROM toks GROUP BY word),
      |bg AS (SELECT word, wc,
      |         unnest(list_transform(generate_series(1, length(word) - 1),
      |                               i -> substr(word, i, 2))) AS pair
      |       FROM w WHERE length(word) > 1),
      |pc AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occ,
      |              count(DISTINCT word) AS n_word_forms
      |       FROM bg GROUP BY pair),
      |r AS (SELECT pair, n_occ, n_word_forms,
      |        row_number() OVER (ORDER BY n_occ DESC, pair) AS rk
      |      FROM pc)
      |SELECT rk, pair, n_occ, n_word_forms FROM r
      |WHERE rk <= 10
      |ORDER BY rk""".stripMargin

  /** Rank depth for the Zipf fit (the whole vocabulary when smaller). */
  private val ZipfTopN = 100

  /** x121: Zipf-law fit — the corpus-statistics QA: OLS of ln(freq) on
    * ln(rank) over the top-[[ZipfTopN]] tokens. Natural language sits near
    * slope −1; a synthetic or templated corpus shows up as a flat or
    * kinked rank-frequency line, which is exactly what this monitor
    * exists to catch. Determinism: each ln is quantized HALF-UP to 1e-9
    * fixed point BEFORE the moment sums (the x20/x59 ln recipe), so Σx,
    * Σy are int64 and Σxy, Σx², Σy² are decimal/HUGEINT — the q70
    * exact-moment OLS on exact integers, doubles entering only in the
    * final slope/intercept/r² divisions. Scale: token-frequency aggregate
    * is the one corpus-scale shuffle; ranking and regression run on the
    * vocab-bounded then [[ZipfTopN]]-row frame. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val tf = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("f"))
    val ranked = tf
      .withColumn("rk", row_number().over(Window.orderBy($"f".desc, $"tok")))
      .filter($"rk" <= ZipfTopN)
    val fp = ranked.select(
      floor(log($"rk".cast("double")) * 1e9 + 0.5).cast("long").as("x"),
      floor(log($"f".cast("double")) * 1e9 + 0.5).cast("long").as("y"))
    val m = fp.agg(count(lit(1)).cast("long").as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
      sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
      sum($"y".cast(dec) * $"y".cast(dec)).as("syy"))
    val cov = ($"n".cast(dec) * $"sxy" - $"sx".cast(dec) * $"sy".cast(dec)).cast("double")
    val varx = ($"n".cast(dec) * $"sxx" - $"sx".cast(dec) * $"sx".cast(dec)).cast("double")
    val vary = ($"n".cast(dec) * $"syy" - $"sy".cast(dec) * $"sy".cast(dec)).cast("double")
    m.withColumn("slope_raw", cov / varx)
      .select($"n".as("n_terms"),
        QueryUtil.halfUp($"slope_raw", 6).as("slope"),
        QueryUtil.halfUp((($"sy".cast("double") - $"slope_raw" * $"sx".cast("double"))
          / $"n".cast("double")) / 1e9, 6).as("intercept_ln"),
        QueryUtil.halfUp(cov * cov / (varx * vary), 6).as("r2"))
  }

  private val zipfFitOracle =
    s"""WITH tf AS (SELECT tok, count(*) AS f
       |           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |           GROUP BY tok),
       |ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rk FROM tf),
       |fp AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS x,
       |              CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS y
       |       FROM ranked WHERE rk <= $ZipfTopN),
       |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
       |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
       |        sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
       |      FROM fp)
       |SELECT CAST(n AS BIGINT) AS n_terms,
       |       floor((CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)
       |              / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS slope,
       |       floor((((CAST(sy AS DOUBLE)
       |                - (CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)
       |                   / CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE))
       |                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 1000000000.0) * 1000000 + 0.5) / 1000000.0 AS intercept_ln,
       |       floor(((CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)
       |               * CAST(n * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE))
       |              / (CAST(n * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)
       |                 * CAST(n * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS r2
       |FROM m""".stripMargin

  /** CDC window width and boundary divisor — single source of truth in
    * [[graft.operators.Cdc]] (shared with the PropertySpec proofs); the
    * oracle SQL is generated from the same constants. */
  private val CdcW = graft.operators.Cdc.W
  private val CdcDiv = graft.operators.Cdc.Div

  /** x122: content-defined chunking — the storage-level dedup primitive
    * (rsync/LBFS/backup-dedup family): chunk boundaries are decided by the
    * CONTENT (rolling-window hash hits a divisor), not by fixed offsets,
    * so an insertion early in a document shifts only the chunk it lands
    * in — unlike x55's fixed non-overlapping token chunks, where one
    * insertion re-aligns every later chunk. Per doc: chunk count, mean
    * chunk length, the md5 digest of the ordered chunk-length sequence
    * (the x75 exact-structure pin), and the cross-corpus dup-chunk stats
    * (chunk instances whose content hash appears in ≥2 distinct docs) —
    * the shared-segment mass a CDC store would deduplicate. Chunking is
    * ARRAY-LOCAL per document (one transform builds the cut list, one
    * builds the chunk structs — zero shuffle, the x20 recipe); the only
    * shuffles are the chunk-hash aggregate and the doc_id rollup.
    * Scale: per-doc work is O(len) md5 windows (the x49 cost shape);
    * the chunk-hash join is banded by content hash — subquadratic, and
    * exactly the access path a 100 TB dedup store maintains anyway. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"text", length($"text").as("len"))
      // fence: `starts` is referenced three times by the chunk transform
      // (size + two element_at) — without the fence the optimizer inlines
      // the O(len) md5 window scan into every reference (measured 6.8 s →
      // see PLANS.md r9 audit). The chunking expressions live in
      // operators/Cdc so the property-tested forms ARE these.
      .withColumn("starts",
        QueryUtil.fence(graft.operators.Cdc.chunkStarts("text", "len")))
    val inst = base.select($"doc_id", $"len",
        posexplode(graft.operators.Cdc.chunkTexts("text", "starts", "len"))
          .as(Seq("pos0", "ch")))
      .select($"doc_id", $"len", ($"pos0" + 1).as("pos"),
        length($"ch").as("clen"), md5($"ch").as("chash"))
      // reuse point (the x16 recipe): `inst` feeds BOTH the chash aggregate
      // and the join probe side — without an exchange here the O(len·md5)
      // chunking pipeline executes twice; post-chunk rows are narrow
      // (5 scalar cols, no text), so one shuffle is cheaper than a re-scan
      .repartition($"doc_id")
    val nd = inst.groupBy($"chash").agg(countDistinct($"doc_id").as("ndocs"))
    inst.join(nd, "chash")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max($"len").as("dlen"),
        sum(when($"ndocs" >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        md5(array_join(expr(
          "transform(sort_array(collect_list(struct(pos, clen))), s -> CAST(s.clen AS STRING))"),
          ",")).as("len_digest"))
      .select($"doc_id", $"n_chunks",
        QueryUtil.halfUp($"dlen".cast("double") / $"n_chunks".cast("double"), 4)
          .as("avg_chunk_len"),
        $"n_dup_chunks",
        QueryUtil.halfUp($"n_dup_chunks".cast("double") / $"n_chunks".cast("double"), 4)
          .as("dup_ratio"),
        $"len_digest")
      .orderBy("doc_id")
  }

  private val cdcChunksOracle = {
    val hx = s"md5(substr(text, CAST(i AS INTEGER), $CdcW))"
    val h16win = (1 to 4).map(j => s"(strpos('0123456789abcdef', substr($hx, $j, 1)) - 1)")
      .reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |s AS (SELECT doc_id, text, len,
       |        list_concat([CAST(1 AS BIGINT)],
       |          list_filter(list_transform(range(1, greatest(len - ${CdcW - 1}, 1) + 1),
       |            i -> CASE WHEN ($h16win) % $CdcDiv = 0 AND i + $CdcW <= len
       |                      THEN i + $CdcW ELSE NULL END),
       |            x -> x IS NOT NULL)) AS starts
       |      FROM d),
       |c AS (SELECT doc_id, len,
       |        unnest(list_transform(range(1, len(starts) + 1),
       |          k -> struct_pack(pos := k,
       |                 ch := substr(text, CAST(starts[CAST(k AS INTEGER)] AS INTEGER),
       |                        CAST((CASE WHEN k < len(starts) THEN starts[CAST(k AS INTEGER) + 1]
       |                              ELSE len + 1 END) - starts[CAST(k AS INTEGER)] AS INTEGER))))) AS u
       |      FROM s),
       |i AS (SELECT doc_id, len, u.pos AS pos, length(u.ch) AS clen, md5(u.ch) AS chash FROM c),
       |nd AS (SELECT chash, count(DISTINCT doc_id) AS ndocs FROM i GROUP BY chash)
       |SELECT i.doc_id, count(*) AS n_chunks,
       |       floor((CAST(max(i.len) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS avg_chunk_len,
       |       CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |       floor((CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS dup_ratio,
       |       md5(string_agg(CAST(i.clen AS VARCHAR), ',' ORDER BY i.pos)) AS len_digest
       |FROM i JOIN nd ON i.chash = nd.chash
       |GROUP BY i.doc_id
       |ORDER BY i.doc_id""".stripMargin
  }

  /** Gopher-rule thresholds (Rae et al. 2021 table A1, adapted to the
    * fixture's scale): word count in [GopherMinWords, GopherMaxWords],
    * mean word length in [3, 10], ≥ 2 distinct stopwords present,
    * top-token share < 30%, duplicate-bigram share ≤ 50%. */
  private val GopherMinWords = 20
  private val GopherMaxWords = 100000

  /** x123: the Gopher quality-rule gate — the canonical heuristic document
    * filter (the published rule family Gopher/MassiveText used), with
    * EVERY threshold an exact integer predicate so both engines agree
    * without a float boundary anywhere: mean-word-length bounds become
    * `3·n ≤ Σlen ≤ 10·n`, top-token share < 30% becomes `10·max_tf <
    * 3·n`, duplicate-bigram share ≤ 50% becomes `2·distinct ≥ total`.
    * Complements x42 (a continuous score) and x58 (two repetition
    * ratios): this is the full pass/fail rule panel a curation pipeline
    * actually gates on, with per-rule booleans for auditability. Scale:
    * ALL rules are array-local per row (token counts, the max term
    * frequency via a distinct×scan loop over the ~40-token vocab of a
    * doc, shifted-slice bigrams) — zero shuffle except the driver-facing
    * ORDER BY; at 100 TB this is a pure map over the corpus. */
  def gopherGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.operators.TextAnalysis.tokens($"text")
    val base = Tables.documents(spark, dir).select($"doc_id", toks.as("t"))
      .select($"doc_id", size($"t").as("n"),
        graft.operators.TextAnalysis.sumTokenLen($"t").as("sumlen"),
        size(array_intersect(array_distinct($"t"),
          array(graft.operators.TextAnalysis.StopwordsEn.map(lit): _*)))
          .as("n_stop_forms"),
        expr("array_max(transform(array_distinct(t), d -> size(filter(t, x -> x = d))))")
          .as("max_tf"),
        expr(s"""IF(size(t) > 1,
                |   transform(sequence(1, size(t) - 1),
                |             i -> concat(element_at(t, i), ' ', element_at(t, i + 1))),
                |   array())""".stripMargin).as("bg"))
      .select($"doc_id", $"n", $"sumlen", $"n_stop_forms", $"max_tf",
        (size($"bg")).as("n_bg"), size(array_distinct($"bg")).as("n_bg_distinct"))
    base.select($"doc_id", $"n".as("n_words"),
        ($"n" >= GopherMinWords && $"n" <= GopherMaxWords).cast("int").as("r_wordcount"),
        (lit(3) * $"n" <= $"sumlen" && $"sumlen" <= lit(10) * $"n").cast("int").as("r_wordlen"),
        ($"n_stop_forms" >= 2).cast("int").as("r_stopwords"),
        (lit(10) * $"max_tf" < lit(3) * $"n").cast("int").as("r_topshare"),
        ($"n_bg" === 0 || lit(2) * $"n_bg_distinct" >= $"n_bg").cast("int").as("r_bigram"))
      .withColumn("keep",
        ($"r_wordcount" === 1 && $"r_wordlen" === 1 && $"r_stopwords" === 1 &&
          $"r_topshare" === 1 && $"r_bigram" === 1).cast("int"))
      .orderBy("doc_id")
  }

  /** The five rules as SQL predicates over the gop-chain's `g` columns —
    * one definition feeding both the x123 oracle and the capstone-v4
    * keep CTE, so the thresholds cannot drift. */
  private val gopherRuleSqls: Seq[(String, String)] = Seq(
    "r_wordcount" -> s"n >= $GopherMinWords AND n <= $GopherMaxWords",
    "r_wordlen" -> "3 * n <= sumlen AND sumlen <= 10 * n",
    "r_stopwords" -> "n_stop_forms >= 2",
    "r_topshare" -> "10 * max_tf < 3 * n",
    "r_bigram" -> "(n_bg = 0 OR 2 * n_bg_distinct >= n_bg)")

  private val gopherAllPredSql: String =
    gopherRuleSqls.map(_._2).map(p => s"($p)").mkString(" AND ")

  /** The tokenize → measure → aggregate chain ending in
    * `${p}g(doc_id, n, sumlen, n_stop_forms, max_tf, n_bg, n_bg_distinct)`;
    * `p` prefixes the CTE names so the chain can splice into statements
    * that already use b/m/g. */
  private def gopherChainSql(p: String): String = {
    val stops = graft.operators.TextAnalysis.StopwordsEnSql
    s"""${p}b AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |${p}m AS (
       |  SELECT doc_id, len(t) AS n,
       |         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sumlen,
       |         len(list_filter(list_distinct(t), x -> x IN ($stops))) AS n_stop_forms,
       |         list_max(list_transform(list_distinct(t), d -> len(list_filter(t, x -> x = d)))) AS max_tf,
       |         CASE WHEN len(t) > 1
       |              THEN list_transform(generate_series(1, len(t) - 1),
       |                     i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1])
       |              ELSE [] END AS bg
       |  FROM ${p}b),
       |${p}g AS (
       |  SELECT doc_id, n, sumlen, n_stop_forms, max_tf,
       |         len(bg) AS n_bg, len(list_distinct(bg)) AS n_bg_distinct
       |  FROM ${p}m)""".stripMargin
  }

  /** Splice-ready CTE block (leading names prefixed `gop_`) ending in
    * `gopher_keep(doc_id)` — the capstone-v4 gate. */
  private[queries] lazy val gopherKeepCtes: String =
    gopherChainSql("gop_") +
      s""",
         |gopher_keep AS (SELECT doc_id FROM gop_g WHERE $gopherAllPredSql)""".stripMargin

  /** The x123 gate reduced to surviving doc ids — the capstone-v4 stage. */
  private[queries] def gopherKeepIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gopherGate(spark, dir).filter($"keep" === 1).select($"doc_id")
  }

  private val gopherGateOracle = {
    val rules = gopherRuleSqls
      .map { case (nm, p) => s"CAST($p AS INTEGER) AS $nm" }
      .mkString(",\n       ")
    s"""WITH ${gopherChainSql("")}
       |SELECT doc_id, CAST(n AS INTEGER) AS n_words,
       |       $rules,
       |       CAST($gopherAllPredSql AS INTEGER) AS keep
       |FROM g
       |ORDER BY doc_id""".stripMargin
  }

  /** Span-corruption geometry: one span per FULL [[SpanBlock]]-token
    * block, start offset ∈ [0, 16) and length ∈ [2, 4] both hash-chosen —
    * spans are block-local by construction (16 + 4 ≤ 20), so no
    * overlap/ordering pass is needed and the whole example builds
    * array-locally per document. ~15% of tokens masked (3/20). */
  private val SpanBlock = 20

  /** x126: T5-style span corruption — the pretraining-example builder for
    * denoising objectives: deterministic spans are cut from each document,
    * the input keeps one `<X_k>` sentinel per span, and the target is the
    * sentinel-delimited sequence of removed spans. Everything is
    * hash-derived from (doc_id, block) with the x57 16-bit recipe, so the
    * corruption is reproducible across runs/engines (and re-saltable per
    * epoch by changing the literal salt). Emits per doc: token/span
    * counts, the masked fraction, and md5 digests of the exact input and
    * target strings (content-pinning without shipping the strings).
    * Scale: pure per-row map (the x123/x20 array-local discipline) —
    * zero shuffle except the driver-facing ORDER BY. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def h(salt: String) =
      s"CAST(conv(substring(md5(concat_ws('|', '$salt', doc_id, k)), 1, 4), 16, 10) AS BIGINT)"
    val base = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .select($"doc_id", $"t", size($"t").as("n"))
      .withColumn("nb", expr(s"size(t) div $SpanBlock"))
      // per-block span bounds (1-based token positions), block-local
      .withColumn("spans", expr(
        s"""transform(sequence(0, nb - 1), k -> named_struct(
           |  'k', k,
           |  's', k * $SpanBlock + 1 + CAST(${h("sp")} % 16 AS INT),
           |  'l', 2 + CAST(${h("ln")} % 3 AS INT)))""".stripMargin))
      .filter($"nb" >= 1)
    val built = base.select($"doc_id", $"n", $"nb",
      expr("aggregate(spans, 0, (acc, sp) -> acc + sp.l)").as("n_masked"),
      // input: sentinel at each span start, span tokens dropped
      expr(
        s"""array_join(filter(transform(sequence(1, n), i ->
           |  CASE
           |    WHEN (i - 1) div $SpanBlock < nb
           |         AND i >= element_at(spans, CAST((i - 1) div $SpanBlock AS INT) + 1).s
           |         AND i <  element_at(spans, CAST((i - 1) div $SpanBlock AS INT) + 1).s
           |                  + element_at(spans, CAST((i - 1) div $SpanBlock AS INT) + 1).l
           |    THEN IF(i = element_at(spans, CAST((i - 1) div $SpanBlock AS INT) + 1).s,
           |            concat('<X', CAST((i - 1) div $SpanBlock AS STRING), '>'), NULL)
           |    ELSE element_at(t, i)
           |  END), x -> x IS NOT NULL), ' ')""".stripMargin).as("input_str"),
      // target: <X_k> followed by the k-th span's tokens, all spans joined
      expr(
        s"""array_join(transform(spans, sp ->
           |  concat('<X', CAST(sp.k AS STRING), '> ',
           |         array_join(slice(t, sp.s, sp.l), ' '))), ' ')""".stripMargin)
        .as("target_str"))
    built.select($"doc_id", $"n".as("n_tokens"), $"nb".as("n_spans"),
        $"n_masked",
        QueryUtil.halfUp($"n_masked".cast("double") / $"n".cast("double"), 4)
          .as("masked_frac"),
        md5($"input_str").as("input_md5"), md5($"target_str").as("target_md5"))
      .orderBy("doc_id")
  }

  private val spanCorruptionOracle = {
    def h(salt: String) = {
      val m = s"md5(concat_ws('|', '$salt', CAST(doc_id AS VARCHAR), CAST(k AS VARCHAR)))"
      (1 to 4).map(i => s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1)")
        .reduce((a, b) => s"($a * 16 + $b)")
    }
    s"""WITH b AS (
       |  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, t, n, n // $SpanBlock AS nb,
       |         list_transform(range(0, n // $SpanBlock), k -> struct_pack(
       |           k := k,
       |           s := k * $SpanBlock + 1 + (${h("sp")}) % 16,
       |           l := 2 + (${h("ln")}) % 3)) AS spans
       |  FROM b WHERE n // $SpanBlock >= 1),
       |built AS (
       |  SELECT doc_id, n, nb,
       |         CAST(list_sum(list_transform(spans, sp -> sp.l)) AS BIGINT) AS n_masked,
       |         array_to_string(list_filter(list_transform(range(1, n + 1), i ->
       |           CASE
       |             WHEN (i - 1) // $SpanBlock < nb
       |                  AND i >= spans[CAST((i - 1) // $SpanBlock AS INTEGER) + 1].s
       |                  AND i <  spans[CAST((i - 1) // $SpanBlock AS INTEGER) + 1].s
       |                           + spans[CAST((i - 1) // $SpanBlock AS INTEGER) + 1].l
       |             THEN CASE WHEN i = spans[CAST((i - 1) // $SpanBlock AS INTEGER) + 1].s
       |                       THEN '<X' || CAST((i - 1) // $SpanBlock AS VARCHAR) || '>'
       |                       ELSE NULL END
       |             ELSE t[CAST(i AS INTEGER)]
       |           END), x -> x IS NOT NULL), ' ') AS input_str,
       |         array_to_string(list_transform(spans, sp ->
       |           '<X' || CAST(sp.k AS VARCHAR) || '> ' ||
       |           array_to_string(list_slice(t, CAST(sp.s AS INTEGER), CAST(sp.s + sp.l - 1 AS INTEGER)), ' ')), ' ') AS target_str
       |  FROM w)
       |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, CAST(nb AS INTEGER) AS n_spans,
       |       n_masked,
       |       floor((CAST(n_masked AS DOUBLE) / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS masked_frac,
       |       md5(input_str) AS input_md5, md5(target_str) AS target_md5
       |FROM built
       |ORDER BY doc_id""".stripMargin
  }

  /** x130: corpus snapshot diff — the change-data-feed summary a versioned
    * lakehouse emits between two table versions: rows classified
    * added / removed / changed / unchanged by keyed full-outer join with
    * content-hash comparison, rolled up per source. The "next" snapshot is
    * derived deterministically from the base fixture (every 17th doc
    * removed, every 13th edited, every 29th cloned under a new id), so
    * both engines construct the identical version pair and the diff logic
    * itself is what the oracle checks. Scale: one full-outer equi-join on
    * the key + a small rollup — the exact shape of a snapshot diff at any
    * size; content hashes make `changed` detection O(1) per row. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.documents(spark, dir)
      .select($"doc_id", $"source", md5($"text").as("h"))
    val docs = Tables.documents(spark, dir)
    val b = docs.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", $"source",
        md5(when($"doc_id" % 13 === 0, concat($"text", lit(" v2")))
          .otherwise($"text")).as("h"))
      .unionByName(docs.filter($"doc_id" % 29 === 0)
        // clone ids live in the strictly-negative keyspace — out-of-band
        // for ANY fixture size (real doc_ids are >= 0), so clones can
        // never collide with real documents at larger SFs (ADVICE r9:
        // doc_id + 1000000 collided once the fixture passed 1M docs)
        .select((-($"doc_id" + 1L)).as("doc_id"), $"source",
          md5($"text").as("h")))
    val d = a.select($"doc_id", $"source".as("src_a"), $"h".as("ha"))
      .join(b.select($"doc_id", $"source".as("src_b"), $"h".as("hb")),
        Seq("doc_id"), "full_outer")
      .select(coalesce($"src_a", $"src_b").as("source"),
        when($"ha".isNull, "added")
          .when($"hb".isNull, "removed")
          .when($"ha" =!= $"hb", "changed")
          .otherwise("unchanged").as("status"))
    d.groupBy($"source")
      .agg(sum(($"status" === "added").cast("long")).as("n_added"),
        sum(($"status" === "removed").cast("long")).as("n_removed"),
        sum(($"status" === "changed").cast("long")).as("n_changed"),
        sum(($"status" === "unchanged").cast("long")).as("n_unchanged"))
      .orderBy("source")
  }

  private val snapshotDiffOracle =
    """WITH a AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      |b AS (
      |  SELECT doc_id, source,
      |         md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS h
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT -(doc_id + 1) AS doc_id, source, md5(text) AS h
      |  FROM documents WHERE doc_id % 29 = 0),
      |d AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |         CASE WHEN a.h IS NULL THEN 'added'
      |              WHEN b.h IS NULL THEN 'removed'
      |              WHEN a.h <> b.h THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT source,
      |       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x117_stream_topk_parity",
      "streaming top-k maintenance batch parity: unrolled keyed-state fold + emission gating == per-prefix full recompute oracle",
      streamTopkParity, Some(streamTopkParityOracle)),
    QueryDef("x118_clustered_kfold",
      "near-dup-aware k-fold split: folds hashed on dedup cluster id, with the naive per-doc split's measured leakage",
      clusteredKfold, Some(clusteredKfoldOracle)),
    QueryDef("x120_bpe_pairs",
      "BPE merge-round statistics: weighted adjacent-char-pair counts, top-10 merge candidates (tokenizer induction)",
      bpePairs, Some(bpePairsOracle)),
    QueryDef("x121_zipf_fit",
      "Zipf-law fit: exact-moment OLS of ln(freq) on ln(rank) over top vocabulary (corpus-statistics QA)",
      zipfFit, Some(zipfFitOracle)),
    QueryDef("x122_cdc_chunks",
      "content-defined chunking: hash-boundary cuts, per-doc chunk stats + cross-corpus dup-chunk mass (storage dedup primitive)",
      cdcChunks, Some(cdcChunksOracle)),
    QueryDef("x123_gopher_gate",
      "Gopher quality-rule panel: five exact-integer pass/fail rules per document, all array-local (curation gate)",
      gopherGate, Some(gopherGateOracle)),
    QueryDef("x126_span_corruption",
      "T5-style span-corruption example builder: deterministic block-local spans, sentinel input/target digests",
      spanCorruption, Some(spanCorruptionOracle)),
    QueryDef("x130_snapshot_diff",
      "corpus snapshot diff: added/removed/changed/unchanged per source via keyed full-outer + content hashes (CDF summary)",
      snapshotDiff, Some(snapshotDiffOracle)))
}
