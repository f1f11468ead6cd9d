package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bench for the PLANS.md "promote MinHashSig/MinHashBands to
  * doGenCode only if a 10× shingle bench shows it pays" caveat.
  *
  * What doGenCode could save for these expressions is ONLY the
  * interpreted-expression dispatch around each row (virtual eval call,
  * ArrayData boxing); the md5 inner loop is already tight JVM code and
  * would be generated verbatim. So the upper bound on the win is measured
  * by comparing the expression against the IDENTICAL digest loop run via
  * typed mapPartitions (zero expression machinery). If the two track each
  * other at 1× and 10× shingle cardinality, the per-row dispatch is noise
  * and CodegenFallback stays. */
object MinHashBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = 12
    def time(label: String, f: => Unit): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val med = runs.sorted.apply(1)
      println(f"[mhbench] $label%-28s median=$med%.2f s (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
      med
    }
    for (mult <- Seq(1, 10)) {
      // word 3-shingles, optionally tiled ×10 with a distinct suffix per
      // copy so the digest count genuinely scales (no dedup shortcut)
      val base = Tables.documents(spark, dir)
        .select($"doc_id", expr(
          "transform(sequence(0, size(split(text,' ')) - 3), i -> " +
            "concat_ws(' ', slice(split(text,' '), i + 1, 3)))").as("sh0"))
      val docs = (if (mult == 1) base.withColumn("sh", $"sh0")
        else base.withColumn("sh", flatten(transform(sequence(lit(0), lit(mult - 1)),
          m => transform($"sh0", s => concat(s, lit("#"), m.cast("string"))))))
        ).select($"doc_id", $"sh").cache()
      val nsh = docs.select(sum(size($"sh"))).as[Long].head()
      println(s"[mhbench] --- shingles x$mult (total $nsh) ---")
      time(s"expression x$mult", {
        docs.select(expr(s"minhash_sig(sh, $k)").as("sig"))
          .write.format("noop").mode("overwrite").save()
      })
      time(s"mapPartitions x$mult", {
        docs.select($"sh").as[Seq[String]].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val prefixes = (0 until k).map(j => s"$j:".getBytes("UTF-8")).toArray
          val hexChars = "0123456789abcdef".toCharArray
          def toHex(bytes: Array[Byte]): String = {
            val out = new Array[Char](bytes.length * 2)
            var i = 0
            while (i < bytes.length) {
              out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
              out(2 * i + 1) = hexChars(bytes(i) & 0xf)
              i += 1
            }
            new String(out)
          }
          it.map { shingles =>
            val mins = Array.fill[String](k)(null)
            shingles.foreach { s =>
              val sb = s.getBytes("UTF-8")
              var j = 0
              while (j < k) {
                md.update(prefixes(j)); md.update(sb)
                val hex = toHex(md.digest())
                if (mins(j) == null || hex < mins(j)) mins(j) = hex
                j += 1
              }
            }
            mins.map(m => if (m == null) "" else m).toSeq
          }
        }.write.format("noop").mode("overwrite").save()
      })
      docs.unpersist()
    }
    spark.stop()
  }
}
