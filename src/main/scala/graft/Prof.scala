package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.QueryUtil.{halfUp4, fence}

// Dev-only profiling scratch (not part of the library surface).
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, dir)
    t("warmup")(graft.queries.DedupQueries.simhash(spark, dir))
    val base = docs
      .select($"doc_id", graft.operators.TextAnalysis.tokenSet($"text").as("toks"))
      .select($"doc_id", $"toks", graft.operators.Dedup.simhashBits($"toks", 32).as("simhash"))
    val withN = base.withColumn("nt", size($"toks"))
    val l = withN.select($"doc_id".as("a"), $"toks".as("ta"), $"simhash", $"nt".as("na"))
    val r = withN.select($"doc_id".as("b"), $"toks".as("tb"), $"simhash", $"nt".as("nb"))
    val joined = l.join(r,
      l("simhash") === r("simhash") && $"a" < $"b" &&
        $"na" * 2 >= $"nb" && $"nb" * 2 >= $"na")
    val fenced = joined
      .select($"a", $"b", l("simhash").as("simhash"),
        fence(graft.operators.Dedup.jaccardSorted($"ta", $"tb")).as("jraw"))
      .filter($"jraw" >= 0.5)
      .select($"a", $"b", $"simhash", halfUp4($"jraw").as("jaccard"))
      .orderBy("a", "b")
    t("x12_plain")(graft.queries.DedupQueries.simhash(spark, dir))
    t("x12_fenced")(fenced)
    t("x12_plain2")(graft.queries.DedupQueries.simhash(spark, dir))
    t("x12_fenced2")(fenced)
    fenced.explain("formatted")
    spark.stop()
  }
}
