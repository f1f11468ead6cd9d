package graft

import org.apache.spark.sql.functions._

/** Hand-computed semantics for the round-11 span/BPE operators (their
  * corpus-scale parity lives in the x236/x237 oracle rows). */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("graft_r11_docs")
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("src0").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x236 BPE apply: merges learn in weighted order and exhausted rounds no-op") {
    // vocab: aaab(3) ab(1) b(1).
    // r1: (a,a)=6 beats (a,b)=4 -> aaab=[aa,a,b], ab=[a,b]
    // r2: (a,b)=4 beats (aa,a)=3 -> aaab=[aa,ab], ab=[ab]
    // r3: (aa,ab)=3 -> aaab=[aaab]
    // r4..r6: no pairs left -> sentinel no-op (must NOT erase the vocab)
    val dir = writeDocs(Seq(1L -> "aaab aaab ab", 2L -> "aaab b"))
    val out = graft.queries.Round11Queries.bpeApply(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val d1 = out(0); val d2 = out(1)
    assert(d1.getAs[Long]("n_tok") == 3, s"doc1 n_tok=${d1.getAs[Long]("n_tok")}")
    assert(d2.getAs[Long]("n_tok") == 2)
    // every word fully merged back to itself -> token stream == text
    assert(d1.getAs[String]("toks_md5") == md5hex("aaab aaab ab"))
    assert(d2.getAs[String]("toks_md5") == md5hex("aaab b"))
    // packing columns: different shards (1 % 8 != 2 % 8), cursors at zero
    assert(d1.getAs[Long]("cum_before") == 0 && d2.getAs[Long]("cum_before") == 0)
    assert(d1.getAs[Long]("seq_id") == 0 && d1.getAs[Long]("seq_off") == 0)
  }

  test("x237 span dedup: islands merge, within-doc repeats count, short docs pass through") {
    val t = (1 to 12).map(i => s"t$i")       // shared corpus tokens
    val u = (1 to 9).map(i => s"u$i")        // unique spacers
    val v = (1 to 8).map(i => s"v$i")        // within-doc repeat tokens
    val shared8 = t.slice(2, 10)             // t3..t10 — the duplicated 8-gram
    val docs = Seq(
      1L -> t.mkString(" "),                                   // t1..t12: dup run [3,10]
      2L -> shared8.mkString(" "),                             // exactly the dup gram
      3L -> (shared8 ++ u ++ shared8).mkString(" "),           // two separated runs
      4L -> (v ++ Seq("w") ++ v).mkString(" "),                // within-doc repeat only
      5L -> "a b c")                                           // < 8 tokens: trivial keep
    val out = graft.queries.Round11Queries.spanDedup(spark, writeDocs(docs))
      .orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    // doc1: 12 toks, one run covering t3..t10
    assert(row(0).getAs[Long]("n_runs") == 1 && row(0).getAs[Long]("n_removed") == 8)
    assert(row(0).getAs[String]("kept_md5") == md5hex("t1 t2 t11 t12"))
    // doc2: fully removed
    assert(row(1).getAs[Long]("n_kept") == 0)
    assert(row(1).getAs[String]("kept_md5") == md5hex(""))
    // doc3: two islands (starts 1 and 18), spacers survive
    assert(row(2).getAs[Long]("n_runs") == 2 && row(2).getAs[Long]("n_removed") == 16)
    assert(row(2).getAs[String]("kept_md5") == md5hex(u.mkString(" ")))
    // doc4: the repeat is within ONE doc — instance count 2 still dups both
    assert(row(3).getAs[Long]("n_runs") == 2 && row(3).getAs[Long]("n_kept") == 1)
    assert(row(3).getAs[String]("kept_md5") == md5hex("w"))
    // doc5: shorter than the gram -> zero grams, full text kept
    assert(row(4).getAs[Long]("n_runs") == 0 && row(4).getAs[Long]("n_kept") == 3)
    assert(row(4).getAs[String]("kept_md5") == md5hex("a b c"))
  }
}
