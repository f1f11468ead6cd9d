package graft.queries

import graft.{QueryDef, Tables}
import graft.queries.QueryUtil.halfUp4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 coverage batch — the corpus-governance and engine-ops tier a
  * production training-data pipeline runs around the core transforms:
  * regex redaction plumbing, corpus-derived blocklist gating, per-source
  * contamination reporting, n-gram novelty scoring, incremental JOIN view
  * maintenance (the q51 IVM idea extended from aggregates to joins),
  * column profiling, exact-order-statistic winsorization, and calendar
  * gap-filling with forward fill. */
object Round8Queries {

  /** x94's redaction pattern. The fixtures are synthetic word salad with
    * no real PII, so the pattern targets a token family that IS present
    * ("customer"); the deliverable is the regex scan/replace plumbing and
    * its cross-engine parity (Java regex vs RE2 agree on this conservative
    * alternation-free class), with the pattern a config knob. */
  private val RedactPat = "cust[a-z]*"

  /** x94: regex scan + redaction — count pattern hits per document,
    * redact them, and emit the redacted text's length and md5 (the
    * auditable trace a PII-scrub stage leaves without storing cleartext).
    * Scale: narrow per-row work, no shuffle until the final sort. */
  def regexRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val red = regexp_replace($"text", RedactPat, "[X]")
    Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_count($"text", lit(RedactPat)).cast("long").as("n_hits"),
        length(red).cast("long").as("red_len"),
        md5(red).as("red_md5"))
      .orderBy("doc_id")
  }

  private val regexRedactOracle =
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$RedactPat')) AS BIGINT) AS n_hits,
       |       CAST(length(regexp_replace(text, '$RedactPat', '[X]', 'g')) AS BIGINT) AS red_len,
       |       md5(regexp_replace(text, '$RedactPat', '[X]', 'g')) AS red_md5
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Blocklist size and drop threshold (percent, integer predicate). */
  private val BlockTop = 3
  private val BlockPct = 15

  /** x95: blocklist gating — the corpus-derived variant of a safety/spam
    * token filter: the [[BlockTop]] most frequent tokens form the
    * blocklist (deterministic: count desc, token asc), every doc's
    * blocked-token share is computed, and docs exceeding [[BlockPct]]%
    * are dropped. The gate is the exact integer predicate
    * `n_block * 100 > n_tok * pct` — no float threshold. Reported per
    * source: doc counts, drops, and the source's aggregate block rate
    * (one bigint/bigint division — identical doubles both engines).
    * Scale: vocab-sized count frame broadcast; the global top-K window
    * runs on the vocab frame (tiny), never the corpus. */
  def blocklistGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", $"source", explode(split($"text", " ")).as("t"))
    val wTop = Window.orderBy($"c".desc, $"t") // vocab-sized frame only
    val block = tok.groupBy($"t").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wTop)).filter($"r" <= BlockTop)
      .select($"t", lit(1L).as("b"))
    val per = tok.join(broadcast(block), Seq("t"), "left")
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_tok"), sum(coalesce($"b", lit(0L))).as("n_block"))
    per.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"n_block" * 100 > $"n_tok" * BlockPct).cast("long")).as("n_dropped"),
        halfUp4(sum($"n_block").cast("double") / sum($"n_tok").cast("double"))
          .as("block_rate"))
      .orderBy("source")
  }

  private val blocklistGateOracle =
    s"""WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
       |             FROM documents),
       |blk AS (SELECT t FROM (
       |          SELECT t, row_number() OVER (ORDER BY count(*) DESC, t) AS r
       |          FROM tok GROUP BY t)
       |        WHERE r <= $BlockTop),
       |per AS (SELECT doc_id, source, count(*) AS n_tok,
       |          CAST(sum(CASE WHEN t IN (SELECT t FROM blk) THEN 1 ELSE 0 END) AS BIGINT) AS n_block
       |        FROM tok GROUP BY doc_id, source)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN n_block * 100 > n_tok * $BlockPct THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       floor((CAST(sum(n_block) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS block_rate
       |FROM per
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** x96: contamination REPORT — x51's train/eval winnowing overlap rolled
    * up per provenance source: how much of each source's training slice
    * overlaps the eval set. This is the governance view a corpus owner
    * actually reads (which supplier's crawl is contaminated), composed
    * from the already-verified x51 gate. Scale: x51's broadcast-eval
    * shape plus one tiny per-source aggregate. */
  def contaminationReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flagged = PipelineQueries.decontaminate(spark, dir)
      .select($"train_id".as("doc_id")).distinct().withColumn("f", lit(1L))
    Tables.documents(spark, dir).filter($"doc_id" % 40 =!= 0)
      .select($"doc_id", $"source")
      .join(flagged, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce($"f", lit(0L))).as("n_flagged"),
        halfUp4(sum(coalesce($"f", lit(0L))).cast("double")
          / count(lit(1)).cast("double")).as("contam_rate"))
      .orderBy("source")
  }

  private val contaminationReportOracle =
    s"""WITH ${PipelineQueries.contamCtes},
       |pairs AS (SELECT train_id, eval_id, count(*) AS shared_fp
       |          FROM tr JOIN ev USING (fp)
       |          GROUP BY train_id, eval_id
       |          HAVING count(*) >= ${PipelineQueries.ContamMinShared}),
       |flagged AS (SELECT DISTINCT train_id AS doc_id FROM pairs)
       |SELECT d.source, count(*) AS n_train,
       |       CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       floor((CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |              / count(*)) * 10000 + 0.5) / 10000.0 AS contam_rate
       |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
       |WHERE d.doc_id % 40 <> 0
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  /** x97: n-gram novelty — per document, the fraction of its distinct
    * word-3-grams that occur in NO other document (globally unique), the
    * standard memorization/boilerplate signal (low novelty = templated or
    * duplicated content; high = fresh text). Exact rational n_unique /
    * n_grams. Docs with < 3 tokens have no grams and are excluded in both
    * engines. Scale: distinct (doc, gram) then one gram-keyed count join —
    * the same two-shuffle shape as the TF-IDF family. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // native one-pass 3-grams (r16): the interpreted transform() lambda
    // re-evaluated split(text) + slice PER ELEMENT — O(tokens²) per doc;
    // token_ngrams emits the identical gram list (short docs → empty array,
    // so the explode drops them exactly like the old size>=3 filter)
    val grams = Tables.documents(spark, dir)
      .select($"doc_id",
        explode(call_function("token_ngrams", $"text", lit(3))).as("g"))
      .distinct()
    val gdoc = grams.groupBy($"g").agg(count(lit(1)).as("nd"))
    grams.join(gdoc, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(($"nd" === 1).cast("long")).as("n_unique"))
      .select($"doc_id", $"n_grams", $"n_unique",
        halfUp4($"n_unique".cast("double") / $"n_grams".cast("double")).as("novelty"))
      .orderBy("doc_id")
  }

  private val ngramNoveltyOracle =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
      |                i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' '))) AS g
      |       FROM t),
      |grams AS (SELECT DISTINCT doc_id, g FROM g0),
      |gd AS (SELECT g, count(*) AS nd FROM grams GROUP BY g)
      |SELECT grams.doc_id, count(*) AS n_grams,
      |       CAST(sum(CASE WHEN gd.nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |       floor((CAST(sum(CASE WHEN gd.nd = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000.0 AS novelty
      |FROM grams JOIN gd ON grams.g = gd.g
      |GROUP BY grams.doc_id
      |ORDER BY grams.doc_id""".stripMargin

  /** q52: incremental JOIN view maintenance — q51 extended from aggregates
    * to joins. A materialized join view V = A ⋈ B under batch inserts
    * (ΔA, ΔB) is maintained by the standard delta rule
    * `ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB` — three bounded joins instead of a
    * full recompute. Here orders/lineitem are split into base/delta by
    * independent keys (so all four terms are non-empty), Spark evaluates
    * `V₀ ∪ ΔV` term by term, and the oracle computes the FULL join of the
    * full tables: equality proves the decomposition is exhaustive and
    * disjoint. Money follows the exact-integer-cents recipe. Scale: every
    * term is an equi-join on the same key — the delta terms are small by
    * construction, which is the entire point of IVM at 100 TB. */
  def ivmJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey", floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"))
    val oB = o.filter($"o_orderkey" % 10 =!= 0)
    val oD = o.filter($"o_orderkey" % 10 === 0)
    val lB = l.filter($"l_orderkey" % 7 =!= 0)
    val lD = l.filter($"l_orderkey" % 7 === 0)
    def term(a: DataFrame, b: DataFrame) =
      a.join(b, $"o_orderkey" === $"l_orderkey")
        .select($"o_orderpriority", $"cents")
    term(oB, lB)                 // V0
      .unionByName(term(oD, lB)) // ΔA ⋈ B0
      .unionByName(term(oB, lD)) // A0 ⋈ ΔB
      .unionByName(term(oD, lD)) // ΔA ⋈ ΔB
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        (sum($"cents").cast("double") / 100.0).as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val ivmJoinOracle =
    """SELECT o_orderpriority, count(*) AS n_pairs,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q53: column profiling — the ANALYZE-style statistics pass every
    * ingestion pipeline runs: per column, row/null/distinct counts and
    * min/max (numeric columns as rounded doubles, string/date columns as
    * strings; dates rendered through an explicit yyyy-MM-dd format so both
    * engines print identical keys). Scale: one pass per profiled column
    * over a columnar scan that prunes to just that column; the distinct
    * counts are the only shuffles. */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    def num(c: String) = o.agg(
      lit(c).as("col_name"), count(lit(1)).as("n"),
      sum(col(c).isNull.cast("long")).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      round(min(col(c)).cast("double"), 2).as("min_num"),
      round(max(col(c)).cast("double"), 2).as("max_num"),
      lit(null).cast("string").as("min_str"),
      lit(null).cast("string").as("max_str"))
    def str(c: String, render: org.apache.spark.sql.Column) = o.agg(
      lit(c).as("col_name"), count(lit(1)).as("n"),
      sum(col(c).isNull.cast("long")).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      lit(null).cast("double").as("min_num"),
      lit(null).cast("double").as("max_num"),
      min(render).as("min_str"),
      max(render).as("max_str"))
    num("o_orderkey")
      .unionByName(num("o_custkey"))
      .unionByName(num("o_totalprice"))
      .unionByName(str("o_orderpriority", col("o_orderpriority")))
      .unionByName(str("o_orderstatus", col("o_orderstatus")))
      .unionByName(str("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd")))
      .orderBy("col_name")
  }

  private val profileOrdersOracle = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(CAST(min($c) AS DOUBLE), 2) AS min_num,
         |  round(CAST(max($c) AS DOUBLE), 2) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    def str(c: String, render: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  min($render) AS min_str, max($render) AS max_str
         |FROM orders""".stripMargin
    Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
      str("o_orderpriority", "o_orderpriority"),
      str("o_orderstatus", "o_orderstatus"),
      str("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d')"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Winsorization tail share (percent, integer rank arithmetic). */
  private val WinsPct = 5

  /** q54: winsorization — clip each group's values at its exact p05/p95
    * ORDER STATISTICS (k-th smallest, k = n·pct/100 integer arithmetic —
    * no interpolation, no float thresholds), the robust-statistics
    * cleaning step for heavy-tailed metrics. Output per group: the clip
    * bounds, clip counts, and the winsorized mean in exact integer cents.
    * Scale: q25's rank-join shape (window spills per group; no
    * buffer-everything percentile aggregate). */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val counts = o.groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val ranked = o.withColumn("rn", row_number().over(
        Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")))
      .join(broadcast(counts), "o_orderpriority")
    val kLo = ($"n" * WinsPct - ($"n" * WinsPct) % 100) / 100 + 1 // floor(n*pct/100) + 1
    val bounds = ranked.groupBy($"o_orderpriority")
      .agg(max(when($"rn" === kLo, $"o_totalprice")).as("lo"),
        max(when($"rn" === $"n" - kLo + 1, $"o_totalprice")).as("hi"))
    val clipped = o.join(broadcast(bounds), "o_orderpriority")
      .select($"o_orderpriority",
        ($"o_totalprice" < $"lo").cast("long").as("is_lo"),
        ($"o_totalprice" > $"hi").cast("long").as("is_hi"),
        floor(least(greatest($"o_totalprice", $"lo"), $"hi") * 100 + 0.5)
          .cast("long").as("cents"))
    clipped.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"is_lo").as("n_clip_lo"), sum($"is_hi").as("n_clip_hi"),
        halfUp4(sum($"cents").cast("double") / 100.0 / count(lit(1))).as("wins_mean"))
      .orderBy("o_orderpriority")
  }

  private val winsorizeOracle =
    s"""WITH cnt AS (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1),
       |rk AS (SELECT o.o_orderpriority, o.o_totalprice, c.n,
       |         row_number() OVER (PARTITION BY o.o_orderpriority
       |                            ORDER BY o.o_totalprice, o.o_orderkey) AS rn
       |       FROM orders o JOIN cnt c ON o.o_orderpriority = c.o_orderpriority),
       |bounds AS (SELECT o_orderpriority,
       |             max(CASE WHEN rn = (n * $WinsPct) // 100 + 1 THEN o_totalprice END) AS lo,
       |             max(CASE WHEN rn = n - ((n * $WinsPct) // 100 + 1) + 1 THEN o_totalprice END) AS hi
       |           FROM rk GROUP BY o_orderpriority),
       |cl AS (SELECT o.o_orderpriority,
       |         CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END AS is_lo,
       |         CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END AS is_hi,
       |         CAST(floor(least(greatest(o.o_totalprice, b.lo), b.hi) * 100 + 0.5) AS BIGINT) AS cents
       |       FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority)
       |SELECT o_orderpriority, count(*) AS n,
       |       CAST(sum(is_lo) AS BIGINT) AS n_clip_lo,
       |       CAST(sum(is_hi) AS BIGINT) AS n_clip_hi,
       |       floor((CAST(sum(cents) AS DOUBLE) / 100.0 / count(*)) * 10000 + 0.5) / 10000.0 AS wins_mean
       |FROM cl
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Users profiled by q55 (bounds output rows: |users| × day span). */
  private val GapFillUsers = 20

  /** q55: calendar gap-filling + forward fill — the time-series
    * regularization step before any windowed model: each user's activity
    * is expanded to a dense daily calendar between their first and last
    * active day, missing days get an explicit zero count, and the last
    * seen dominant event type carries forward (IGNORE NULLS last_value).
    * Days render as yyyy-MM-dd strings so both engines emit identical
    * keys. Scale: the calendar explode is bounded by span × users; the
    * forward-fill window shuffles once on user_id. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"user_id" < GapFillUsers)
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
    val daily = ev.groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"), max($"event_type").as("dtype"))
    val span = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
    val cal = span.select($"user_id",
      explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n_events"), $"dtype")
      .withColumn("carried_type", last($"dtype", ignoreNulls = true).over(w))
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_events", $"carried_type")
      .orderBy("user_id", "day")
  }

  private val gapFillOracle =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type
       |            FROM events WHERE user_id < $GapFillUsers),
       |daily AS (SELECT user_id, day, count(*) AS n_events, max(event_type) AS dtype
       |          FROM ev GROUP BY user_id, day),
       |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
       |cal AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |        FROM span)
       |SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
       |       coalesce(d.n_events, 0) AS n_events,
       |       last_value(d.dtype IGNORE NULLS) OVER (
       |         PARTITION BY c.user_id ORDER BY c.day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_type
       |FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
       |ORDER BY c.user_id, day""".stripMargin

  /** q89: incremental TOP-K view maintenance — the third IVM family
    * member beside q51 (aggregate) and q52 (join). The algebraic identity
    * that makes top-k incrementally maintainable under INSERTS:
    * topk(A ∪ Δ) = topk(topk(A) ∪ Δ) — dropped base rows can never
    * re-enter a ranking that only grows. The maintained view keeps the
    * per-group top-5 (exact cents, orderkey tie-break); the refresh
    * re-ranks 5·|groups| + |Δ| rows instead of |A| + |Δ|. The oracle is
    * the full recompute the identity must equal. (Deletes would need the
    * classic k-buffer/recompute fallback — out of scope, stated here.)
    * Scale: the base top-k is the stored view (tiny); each refresh
    * shuffles only the delta plus 5 rows per group. */
  def ivmTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2000-01-01").cast("date")
    val o = Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
        $"o_orderdate".cast("date").as("d"))
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents".desc, $"o_orderkey")
    def top5(df: DataFrame) =
      df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
    val storedView = top5(o.filter($"d" < cut)).drop("rk")
    top5(storedView.unionByName(o.filter($"d" >= cut)))
      .select($"o_orderpriority", $"rk", $"o_orderkey",
        ($"cents".cast("double") / 100.0).as("price"))
      .orderBy("o_orderpriority", "rk")
  }

  private val ivmTopKOracle =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rk
      |  FROM orders)
      |SELECT o_orderpriority, rk, o_orderkey,
      |       CAST(cents AS DOUBLE) / 100.0 AS price
      |FROM r WHERE rk <= 5
      |ORDER BY o_orderpriority, rk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q89_ivm_topk",
      "incremental top-k view maintenance: topk(topk(A) + delta) == full recompute oracle",
      ivmTopK, Some(ivmTopKOracle)),
    QueryDef("x94_regex_redact",
      "regex scan + redaction trace (hit counts, redacted length/md5) — PII-scrub plumbing",
      regexRedact, Some(regexRedactOracle)),
    QueryDef("x95_blocklist_gate",
      "corpus-derived blocklist token gating with integer-predicate drop threshold, per-source report",
      blocklistGate, Some(blocklistGateOracle)),
    QueryDef("x96_contamination_report",
      "per-source eval-contamination rates composed from the x51 winnowing gate",
      contaminationReport, Some(contaminationReportOracle)),
    QueryDef("x97_ngram_novelty",
      "per-doc globally-unique 3-gram fraction (memorization/boilerplate signal)",
      ngramNovelty, Some(ngramNoveltyOracle)),
    QueryDef("q52_ivm_join",
      "incremental JOIN view maintenance: delta rule dA*B0 + A0*dB + dA*dB vs full-recompute oracle",
      ivmJoin, Some(ivmJoinOracle)),
    QueryDef("q53_profile",
      "ANALYZE-style column profiling (null/distinct counts, typed min/max) over orders",
      profileOrders, Some(profileOrdersOracle)),
    QueryDef("q54_winsorize",
      "exact order-statistic winsorization per group (integer rank bounds, cents-exact mean)",
      winsorize, Some(winsorizeOracle)),
    QueryDef("q55_gap_fill",
      "calendar gap-filling with zero-fill and IGNORE NULLS forward fill per user",
      gapFill, Some(gapFillOracle)))
}
