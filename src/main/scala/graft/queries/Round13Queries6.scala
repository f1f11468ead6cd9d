package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 sixth tier: pass@k (the unbiased LLM-eval estimator as
  * exact combinatorics), inverted-index posting compression sizing
  * (delta + varint byte counts — the storage arithmetic behind every
  * search index), and the range-partitioner boundary audit (sample →
  * boundaries → exact balance measurement, Spark's RangePartitioner
  * contract made inspectable).
  */
object Round13Queries6 {

  // ---------------------------------------------------------------- x327

  /** Samples per problem and the k of pass@k. */
  private val PassN = 20
  private val PassK = 5
  /** Π_{i<k}(n−i) for n = [[PassN]] — the fixed denominator. */
  private val PassDen = (0 until PassK).map(i => (PassN - i).toLong).product

  /** x327: pass@k — the Codex-paper unbiased estimator
    * 1 − C(n−c, k)/C(n, k) over n samples with c successes, THE metric
    * every code/reasoning eval reports. Each "problem" is a user, its
    * first [[PassN]] events (by event_id) are the samples, and a
    * high-value purchase is a "pass". The combinatorial ratio is the
    * telescoping product Π_{i<k}(n−c−i)/(n−i) — exact BIGINTs at
    * n = 20 (num ≤ 20⁵), zero when n−c < k, so the estimate is an
    * exact rational and only the reported pass@k is quantized. The
    * final row (-1) macro-averages pass@k across problems the way eval
    * suites do — as the exact SUM of per-problem numerators over a
    * common denominator, immune to float accumulation order.
    *
    * Scale: one groupBy(user) with map-side partials; the per-problem
    * arithmetic is O(k) multiplications on the aggregate row. */
  def passAtK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        when($"event_type" === "purchase" && $"value" > 150.0, 1L)
          .otherwise(0L).as("ok"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"event_id")))
      .filter($"rk" <= PassN)
    val per = ranked.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"ok").as("c"))
      .filter($"n" === PassN.toLong)
    val numExpr = (0 until PassK)
      .map(i => ($"n" - $"c" - i.toLong))
      .reduce(_ * _)
    val scored = per
      .withColumn("fail_num",
        when($"n" - $"c" >= PassK.toLong, numExpr).otherwise(0L))
      .withColumn("den", lit(PassDen))
    val rows = scored.select($"user_id", $"n", $"c", $"fail_num", $"den",
      QueryUtil.halfUp(lit(1.0)
        - $"fail_num".cast("double") / $"den".cast("double"), 6).as("passk"))
    val macroRow = scored.agg(
      count(lit(1)).as("n"), sum($"c").as("c"),
      sum($"fail_num").as("fail_num"),
      (count(lit(1)) * PassDen).as("den"))
      .select(lit(-1L).as("user_id"), $"n", $"c", $"fail_num", $"den",
        QueryUtil.halfUp(lit(1.0)
          - $"fail_num".cast("double") / $"den".cast("double"), 6).as("passk"))
    rows.unionByName(macroRow).orderBy($"user_id")
  }

  private val passAtKOracle = {
    val numSql = (0 until PassK).map(i => s"(n - c - $i)").mkString(" * ")
    s"""WITH ranked AS (
       |  SELECT user_id,
       |         CASE WHEN event_type = 'purchase' AND value > 150.0
       |              THEN 1 ELSE 0 END AS ok,
       |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rk
       |  FROM events),
       |per AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(ok) AS BIGINT) AS c
       |  FROM ranked WHERE rk <= $PassN GROUP BY 1 HAVING count(*) = $PassN),
       |scored AS (
       |  SELECT user_id, n, c,
       |         CASE WHEN n - c >= $PassK THEN $numSql ELSE 0 END AS fail_num,
       |         CAST($PassDen AS BIGINT) AS den
       |  FROM per)
       |SELECT user_id, n, c, fail_num, den,
       |       floor((1.0 - CAST(fail_num AS DOUBLE) / CAST(den AS DOUBLE))
       |             * 1000000 + 0.5) / 1000000.0 AS passk
       |FROM scored
       |UNION ALL
       |SELECT -1, CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
       |       CAST(sum(fail_num) AS BIGINT),
       |       CAST(count(*) * $PassDen AS BIGINT),
       |       floor((1.0 - CAST(sum(fail_num) AS DOUBLE)
       |                    / CAST(count(*) * $PassDen AS DOUBLE))
       |             * 1000000 + 0.5) / 1000000.0
       |FROM scored
       |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- x328

  /** Terms reported (by descending document frequency). */
  private val PostTopK = 30

  /** x328: posting-list compression sizing — the storage arithmetic of
    * every inverted index at scale (Lucene/Tantivy postings are
    * delta + varint encoded): per term, sort the distinct doc_ids,
    * delta-encode (first id raw), and charge LEB128 varint bytes per
    * gap with threshold CASEs (< 2⁷ → 1B, < 2¹⁴ → 2B, < 2²¹ → 3B,
    * < 2²⁸ → 4B, else 5B — log-free, exact). Emits raw-int64 vs varint
    * bytes and the compression ratio for the [[PostTopK]] heaviest
    * terms — the numbers an index-layout planner trades off.
    *
    * Scale: one explode + distinct (hash shuffle on (term, doc)), one
    * term-keyed window for the lag — postings density grows linearly
    * with the corpus, never quadratically. */
  def postingsCompression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val postings = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter(length($"term") > 0)
      .distinct()
    val gaps = postings
      .withColumn("prev", lag($"doc_id", 1).over(
        Window.partitionBy($"term").orderBy($"doc_id")))
      .withColumn("gap", when($"prev".isNull, $"doc_id").otherwise($"doc_id" - $"prev"))
    def vbytes(c: Column): Column =
      when(c < 128L, 1L).when(c < 16384L, 2L).when(c < 2097152L, 3L)
        .when(c < 268435456L, 4L).otherwise(5L)
    gaps.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum(vbytes($"gap")).as("varint_bytes"))
      .withColumn("raw_bytes", $"df" * 8L)
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"df".desc, $"term")))
      .filter($"rk" <= PostTopK)
      .select($"term", $"df", $"raw_bytes", $"varint_bytes",
        QueryUtil.halfUp4($"varint_bytes".cast("double") / $"raw_bytes".cast("double"))
          .as("ratio"))
      .orderBy($"term")
  }

  private val postingsOracle =
    s"""WITH postings AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE length(t.term) > 0),
       |gaps AS (
       |  SELECT term,
       |         COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
       |                  doc_id) AS gap
       |  FROM postings),
       |sized AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df,
       |         CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
       |                       WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
       |                       ELSE 5 END) AS BIGINT) AS varint_bytes
       |  FROM gaps GROUP BY 1),
       |ranked AS (
       |  SELECT *, df * 8 AS raw_bytes,
       |         row_number() OVER (ORDER BY df DESC, term) AS rk
       |  FROM sized)
       |SELECT term, df, raw_bytes, varint_bytes,
       |       floor(CAST(varint_bytes AS DOUBLE) / CAST(raw_bytes AS DOUBLE)
       |             * 10000 + 0.5) / 10000.0 AS ratio
       |FROM ranked WHERE rk <= $PostTopK
       |ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- x329

  /** Deterministic sample stride and target partition count. */
  private val RangeStride = 101L
  private val RangeParts = 8

  /** x329: range-partitioner boundary audit — Spark's RangePartitioner
    * contract made inspectable: draw a deterministic sample (orderkey ≡
    * 0 mod [[RangeStride]]), cut [[RangeParts]]−1 boundaries at equal
    * sample ranks, then measure the EXACT row count each range bucket
    * receives (bucket = #boundaries < value, the partitioner's rule).
    * Emits per-bucket counts, their fraction of the table, and whether
    * the worst bucket stays within 2× of ideal — the skew bound a
    * sample-based global sort actually delivers (the engine-ops
    * counterpart of x140's salted-agg and x146's AQE skew split).
    *
    * Scale: the sample is stride-bounded (|sample| = rows/101 — the
    * collect_list is the same bounded-model shape as the IVF centroid
    * tables); the audit pass is one broadcast of 7 boundaries + a
    * map-side bucket classification. */
  def rangeBoundaries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select($"o_orderkey",
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val sample = cents.filter($"o_orderkey" % RangeStride === 0L)
      .agg(sort_array(collect_list($"cents")).as("s"))
      .select($"s", size($"s").cast("long").as("slen"))
    // greatest(1, ·): a sample smaller than the partition count must
    // yield duplicated boundaries (skewed but defined, parity-consistent),
    // not element_at(s, 0), which Spark rejects while DuckDB s[0] returns
    // NULL — divergent failure modes (r13 code-review catch).
    val withB = sample.select((1 until RangeParts).map(i =>
      expr(s"element_at(s, CAST(greatest(1, ($i * slen) DIV $RangeParts) AS INT))")
        .as(s"b$i")): _*)
    val bucketed = cents.crossJoin(broadcast(withB))
      .select($"cents",
        (1 until RangeParts).map(i =>
          when($"cents" > col(s"b$i"), 1L).otherwise(0L))
          .reduce(_ + _).as("bucket"))
    val counts = bucketed.groupBy($"bucket").agg(count(lit(1)).as("cnt"))
    val tot = Window.partitionBy(lit(1))
    counts
      .withColumn("total", sum($"cnt").over(tot))
      .select($"bucket", $"cnt",
        QueryUtil.halfUp($"cnt".cast("double") / $"total".cast("double"), 6)
          .as("frac"),
        // exact 2x-of-ideal bound: cnt * parts <= 2 * total
        when($"cnt" * RangeParts.toLong <= $"total" * 2L, 1L).otherwise(0L)
          .as("within_2x"))
      .orderBy($"bucket")
  }

  private val rangeBoundariesOracle = {
    val bDefs = (1 until RangeParts).map(i =>
      s"s[CAST(greatest(1, ($i * slen) // $RangeParts) AS INT)] AS b$i").mkString(",\n       |         ")
    val bucketExpr = (1 until RangeParts).map(i =>
      s"CASE WHEN cents > b$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH cents AS MATERIALIZED (
       |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM orders),
       |sample AS (
       |  SELECT list(cents ORDER BY cents) AS s,
       |         CAST(count(*) AS BIGINT) AS slen
       |  FROM cents WHERE o_orderkey % $RangeStride = 0),
       |bnd AS (
       |  SELECT $bDefs
       |  FROM sample),
       |bucketed AS (
       |  SELECT CAST($bucketExpr AS BIGINT) AS bucket
       |  FROM cents, bnd),
       |counts AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM bucketed GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
       |SELECT bucket, cnt,
       |       floor(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5)
       |         / 1000000.0 AS frac,
       |       CAST(CASE WHEN cnt * $RangeParts <= total * 2 THEN 1 ELSE 0 END
       |            AS BIGINT) AS within_2x
       |FROM counts, tot
       |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x327_pass_at_k",
      "pass@k unbiased estimator: exact telescoping-product combinatorics per problem plus a float-accumulation-free macro average",
      passAtK, Some(passAtKOracle)),
    QueryDef("x328_postings_compression",
      "inverted-index posting sizing: delta + LEB128 varint byte counts per term, log-free threshold CASEs, exact ints",
      postingsCompression, Some(postingsOracle)),
    QueryDef("x329_range_boundaries",
      "range-partitioner boundary audit: deterministic sample cuts, exact per-bucket counts, 2x-of-ideal skew bound",
      rangeBoundaries, Some(rangeBoundariesOracle)))
}
