package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Unit semantics of the text / dedup / similarity operator libraries. */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens + counts + stopword filter") {
    val df = Seq("the quick fox and the dog").toDF("text")
    val toks = TextAnalysis.tokens($"text")
    val row = df.select(
      size(toks).as("n"),
      size(array_distinct(toks)).as("u"),
      TextAnalysis.countIn(toks, TextAnalysis.StopwordsEn).as("s"),
      TextAnalysis.sumTokenLen(toks).as("len"))
      .as[(Int, Int, Int, Long)].head()
    assert(row == ((6, 5, 3, 20L))) // "the" twice + "and"; 20 token chars
  }

  test("language-ID argmax is deterministic and falls back to 'und'") {
    val scores = TextAnalysis.LangMarkers.map { case (l, ws) =>
      l -> TextAnalysis.countIn(TextAnalysis.tokens($"text"), ws)
    }
    val df = Seq("the cat and the hat", "el gato de la casa", "zzz qqq").toDF("text")
      .select(TextAnalysis.predictedLang(scores).as("p"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint: short text falls back to whole-text hash") {
    val df = Seq("tiny", "this text is longer than sixteen chars").toDF("text")
      .select(TextAnalysis.fingerprint($"text", 16).as("fp"), length($"text").as("l"))
    val rows = df.as[(String, Int)].collect()
    assert(rows.forall(_._1.matches("[0-9a-f]{32}")))
  }

  test("jaccard on distinct arrays") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard($"x", $"y").as("j"))
    assert(math.abs(df.as[Double].head() - 0.5) < 1e-12) // 2 / 4
  }

  test("minhash: identical shingle sets -> identical signatures; LSH finds the pair") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")), // identical
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("doc_id", "shingles")
    val sig = docs.select(col("doc_id") +: col("shingles") +: Dedup.minhashSig($"shingles", 12): _*)
    val mh = sig.orderBy("doc_id").drop("doc_id", "shingles").collect()
    assert(mh(0) == mh(1) && mh(0) != mh(2))
    val cand = Dedup.lshCandidates(docs, "doc_id", "shingles", numHashes = 12, rowsPerBand = 3)
    assert(cand.as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("simhash: 16 bits, equal token sets collide, disjoint sets differ") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma")),
      (2L, Seq("gamma", "alpha", "beta")), // same set, different order
      (3L, Seq("delta", "epsilon", "zeta"))).toDF("id", "toks")
      .select($"id", Dedup.simhashBits($"toks", 16).as("sh"))
    val m = df.as[(Long, String)].collect().toMap
    assert(m.values.forall(s => s.length == 16 && s.matches("[01]{16}")))
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L)) // 3 random disjoint tokens: collision chance 2^-16-ish
  }

  test("cosine/dot/norm on known vectors") {
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),  // orthogonal
      (Seq(1f, 2f, 2f), Seq(1f, 2f, 2f)),  // identical, norm 3
      (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f))) // opposite
      .toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c"), Similarity.norm($"a").as("n"))
    val rows = df.as[(Double, Double)].collect()
    assert(math.abs(rows(0)._1 - 0.0) < 1e-12)
    assert(math.abs(rows(1)._1 - 1.0) < 1e-12 && math.abs(rows(1)._2 - 3.0) < 1e-12)
    assert(math.abs(rows(2)._1 + 1.0) < 1e-12)
  }

  test("signBucket: sign pattern of leading dims") {
    val df = Seq(Seq(0.5f, -0.2f, 0.1f, -0.9f)).toDF("v")
      .select(Similarity.signBucket($"v", 4).as("b"))
    assert(df.as[String].head() == "1010")
  }
}
