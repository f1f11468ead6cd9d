package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-second tier: unsupervised keyphrase extraction —
  * RAKE (x215), the degree/frequency co-occurrence scorer that
  * complements x161's TextRank (graph centrality) with a one-pass
  * phrase statistic. */
object Round10Queries42 {

  /** RAKE stopwords in this corpus (the fixture's function words). */
  private val RakeStops = Seq("the", "a")

  /** Maximum phrase length — stopword-delimited runs are re-chunked to
    * this cap so the sparse-stopword fixture can't produce degenerate
    * 50-token "phrases". */
  private val RakeMaxLen = 3

  /** Published keyphrases. */
  private val RakeTop = 20

  /** x215: RAKE keyphrase extraction — candidate phrases are maximal
    * non-stopword runs (re-chunked to ≤ [[RakeMaxLen]] tokens), each
    * word scores deg/freq (deg = total length of phrases it appears
    * in, freq = its phrase occurrences — words keeping long company
    * outrank merely frequent ones), and a phrase scores the sum of its
    * members' scores. Word scores are exact integer ratios in 1e-6
    * fixed point BEFORE the phrase sum, so every ranking key is an
    * order-free integer. Publishes the top [[RakeTop]] by
    * (score, phrase).
    *
    * Scale: tokenize+explode is the standard corpus pass (x40's
    * shape); phrase and word stats are vocab-bounded aggregates; the
    * scoring join is phrase-member-sized — no pairwise blowup
    * anywhere. */
  def rake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stops = RakeStops.map(s => s"'$s'").mkString("(", ", ", ")")
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .filter(length($"tok") > 0)
    val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val marked = toks.withColumn("is_stop",
      expr(s"CASE WHEN tok IN $stops THEN 1 ELSE 0 END"))
      .withColumn("run_id", sum($"is_stop").over(wDoc))
      .filter($"is_stop" === 0)
    val wRun = Window.partitionBy($"doc_id", $"run_id").orderBy($"pos")
    val chunked = marked
      .withColumn("pn", (row_number().over(wRun) - lit(1)).cast("long"))
      .withColumn("k", expr(s"pn div $RakeMaxLen"))
    val members = chunked.select($"doc_id", $"run_id", $"k", $"pos", $"tok")
      .localCheckpoint(true)
    val wordStats = members
      .join(members.groupBy($"doc_id", $"run_id", $"k")
        .agg(count(lit(1)).as("plen")), Seq("doc_id", "run_id", "k"))
      .groupBy($"tok")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("deg"))
      .select($"tok", expr("(deg * 1000000) div freq").as("wscore_fp"))
    val phrases = members
      .groupBy($"doc_id", $"run_id", $"k")
      .agg(expr("array_join(transform(sort_array(collect_list(" +
        "struct(pos, tok))), s -> s.tok), ' ')").as("phrase"))
    val scored = members.join(broadcast(wordStats), "tok")
      .groupBy($"doc_id", $"run_id", $"k")
      .agg(sum($"wscore_fp").as("pscore_fp"))
      .join(phrases, Seq("doc_id", "run_id", "k"))
    scored.groupBy($"phrase")
      .agg(count(lit(1)).as("support"), max($"pscore_fp").as("score_fp"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"score_fp".desc, $"phrase")).cast("long"))
      .filter($"rk" <= RakeTop)
      .select($"rk", $"phrase", $"support", $"score_fp")
      .orderBy($"rk")
  }

  private val rakeOracle = {
    val stops = RakeStops.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, tok FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE length(tok) > 0),
       |marked AS MATERIALIZED (
       |  SELECT doc_id, pos, tok,
       |         CAST(sum(CASE WHEN tok IN $stops THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS run_id,
       |         CASE WHEN tok IN $stops THEN 1 ELSE 0 END AS is_stop
       |  FROM toks),
       |members AS MATERIALIZED (
       |  SELECT doc_id, run_id, pos, tok,
       |         CAST((row_number() OVER (PARTITION BY doc_id, run_id
       |           ORDER BY pos) - 1) // $RakeMaxLen AS BIGINT) AS k
       |  FROM marked WHERE is_stop = 0),
       |plens AS (SELECT doc_id, run_id, k, CAST(count(*) AS BIGINT) AS plen
       |          FROM members GROUP BY doc_id, run_id, k),
       |word_stats AS MATERIALIZED (
       |  SELECT m.tok,
       |         CAST((sum(p.plen) * 1000000) // count(*) AS BIGINT) AS wscore_fp
       |  FROM members m JOIN plens p
       |    ON p.doc_id = m.doc_id AND p.run_id = m.run_id AND p.k = m.k
       |  GROUP BY m.tok),
       |phrases AS (
       |  SELECT doc_id, run_id, k,
       |         string_agg(tok, ' ' ORDER BY pos) AS phrase
       |  FROM members GROUP BY doc_id, run_id, k),
       |scored AS (
       |  SELECT m.doc_id, m.run_id, m.k,
       |         CAST(sum(w.wscore_fp) AS BIGINT) AS pscore_fp
       |  FROM members m JOIN word_stats w ON w.tok = m.tok
       |  GROUP BY m.doc_id, m.run_id, m.k),
       |agg0 AS (
       |  SELECT p.phrase, CAST(count(*) AS BIGINT) AS support,
       |         CAST(max(s.pscore_fp) AS BIGINT) AS score_fp
       |  FROM scored s JOIN phrases p
       |    ON p.doc_id = s.doc_id AND p.run_id = s.run_id AND p.k = s.k
       |  GROUP BY p.phrase)
       |SELECT rk, phrase, support, score_fp FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, phrase)
       |              AS BIGINT) AS rk, phrase, support, score_fp
       |  FROM agg0) t
       |WHERE rk <= $RakeTop
       |ORDER BY rk""".stripMargin
  }

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x215_rake",
      "RAKE keyphrase extraction: stopword-delimited capped phrases, integer deg/freq word scores, top-20 by summed phrase score",
      rake, Some(rakeOracle)))
}
