package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: measure how close the libm-ln() quantization sites come to a
  * floor boundary — the evidence behind the "hash gate detects, boundary
  * landing unlikely" claim in x56/x59/x80/x84/x88/x89.
  *
  * Each of those queries computes `floor(f(ln(...)) * scale + 0.5)` and
  * the residual cross-engine risk is a sub-ulp JVM-vs-DuckDB ln()
  * difference flipping the floor. That flip can only happen if
  * y = f(...)·scale + 0.5 lands within ~an ulp of an integer. This audit
  * recomputes every y the fixtures actually produce (x59's input domain
  * is the full 65536-value hash lattice — exhaustive, fixture-free) and
  * reports the MINIMUM distance to the nearest integer alongside the ulp
  * at that magnitude: margin_ulps = min_d / ulp(max|y|). Margins of 10³+
  * ulps mean a boundary flip needs a libm divergence thousands of ulps
  * wide — far beyond any real libm pair — closing the ADVICE item with
  * measurement instead of assertion. Results: PLANS.md (round 8). */
object LnBoundaryAudit {

  private def report(name: String, df: DataFrame, y: Column): Unit = {
    val d = {
      val frac = y - floor(y)
      least(frac, lit(1.0) - frac)
    }
    val row = df.select(d.as("d"), abs(y).as("ay"))
      .agg(min(col("d")).as("min_d"), max(col("ay")).as("max_y"),
        count(lit(1)).as("n"))
      .head()
    val (minD, maxY, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    val ulp = java.lang.Math.ulp(maxY)
    println(f"[lnaudit] $name%-22s rows=$n%-9d min_d=$minD%.3e ulp(max_y)=$ulp%.3e margin_ulps=${minD / ulp}%.1f")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    println(s"[lnaudit] sf dir: $dir")

    // x59: exhaustive over the full 16-bit hash lattice (domain, not fixture)
    report("x59_ln_u_1e9", spark.range(0, 65536L).toDF("h"),
      log(($"h".cast("double") + lit(0.5)) / lit(65536.0)) * lit(1e9) + lit(0.5))

    // x56: unigram surprisal -ln(cnt/total) * 1e6
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val v = tok.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val tot = v.agg(sum($"cnt").as("total"))
    report("x56_unigram_1e6", v.crossJoin(broadcast(tot)),
      -log($"cnt".cast("double") / $"total".cast("double")) * lit(1e6) + lit(0.5))

    // x88: interpolated bigram -ln(p) * 1e6 over the actual token stream
    val w = Window.partitionBy($"doc_id").orderBy($"i")
    val tok2 = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("i", "cur")))
      .withColumn("prev", lag($"cur", 1).over(w))
    val c1 = tok2.groupBy($"cur".as("w")).agg(count(lit(1)).as("c1"))
    val t2 = c1.agg(sum($"c1").as("t"))
    val c2 = tok2.filter($"prev".isNotNull)
      .groupBy($"prev".as("pw"), $"cur".as("cw")).agg(count(lit(1)).as("c2"))
    val lam = 0.75 // TrainingQueries.BigramLambda
    val p = when($"prev".isNull, $"cc".cast("double") / $"t".cast("double"))
      .otherwise(lit(lam) * ($"c2".cast("double") / $"pc".cast("double"))
        + lit(1.0 - lam) * ($"cc".cast("double") / $"t".cast("double")))
    val joined = tok2
      .join(broadcast(c1.select($"w".as("cur"), $"c1".as("cc"))), "cur")
      .join(broadcast(c1.select($"w".as("prev"), $"c1".as("pc"))), Seq("prev"), "left")
      .join(broadcast(c2.select($"pw".as("prev"), $"cw".as("cur"), $"c2")), Seq("prev", "cur"), "left")
      .crossJoin(broadcast(t2))
    report("x88_bigram_1e6", joined, -log(p) * lit(1e6) + lit(0.5))

    // x80/x84: BM25 idf * tfNorm * 1e6 (x84 additionally at half weight)
    val po = RetrievalQueries.postings(spark, dir)
    val idf = log(($"n_docs".cast("double") - $"df".cast("double") + lit(0.5))
      / ($"df".cast("double") + lit(0.5)) + lit(1.0))
    val tfNorm = $"tf".cast("double") * 2.2 /
      ($"tf".cast("double") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * $"dl".cast("double")
        * $"n_docs".cast("double") / $"tot".cast("double")))
    val bm = po.qterms.join(po.tf, "t").filter($"doc_id" =!= $"q_id")
      .join(broadcast(po.dft), "t")
      .join(po.dl, "doc_id")
      .crossJoin(broadcast(po.stats))
    report("x80_bm25_1e6", bm, idf * tfNorm * lit(1e6) + lit(0.5))
    report("x84_bm25_half_1e6", bm, lit(0.5) * idf * tfNorm * lit(1e6) + lit(0.5))

    // x89: QL sparse term ln(1 + tf/(mu*P(t|C))) * 1e6 and the per-(q,d)
    // length normalization qlen * ln(mu / (dl + mu)) * 1e6
    val mu = 100.0
    val ctf = po.tf.groupBy($"t").agg(sum($"tf").as("ctf"))
    val totT = po.dl.agg(sum($"dl").as("tot"))
    val sp = po.qterms.join(po.tf, "t").filter($"doc_id" =!= $"q_id")
      .join(broadcast(ctf), "t").crossJoin(broadcast(totT))
    report("x89_ql_sparse_1e6", sp,
      log(lit(1.0) + $"tf".cast("double") /
        (lit(mu) * ($"ctf".cast("double") / $"tot".cast("double")))) * lit(1e6) + lit(0.5))
    val qlen = po.qterms.groupBy($"q_id").agg(count(lit(1)).as("qlen"))
    val norm = qlen.crossJoin(po.dl.select($"dl").distinct())
    report("x89_ql_norm_1e6", norm,
      $"qlen".cast("double") * log(lit(mu) / ($"dl".cast("double") + lit(mu))) * lit(1e6) + lit(0.5))

    // q90: Hill log-excess ln(c/thr) * 1e6 over the top-k order values
    val rankedC = Tables.orders(spark, dir)
      .select($"o_orderkey", floor($"o_totalprice" * 100 + 0.5).cast("long").as("c"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"c".desc, $"o_orderkey")))
      .filter($"rk" <= 201)
    val thrC = rankedC.filter($"rk" === 201).select($"c".as("thr"))
    report("q90_hill_1e6", rankedC.filter($"rk" <= 200).crossJoin(broadcast(thrC)),
      log($"c".cast("double") / $"thr".cast("double")) * lit(1e6) + lit(0.5))

    spark.stop()
  }
}
