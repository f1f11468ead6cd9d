package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same pin as Verify/Smoke: the events NTZ normalization (Tables.events)
      // casts an instant timestamp through the session zone, so an unpinned
      // bench on a non-UTC host would run different plans than Verify.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize EVERY column: `.count()` would let Catalyst prune
    // computed projections that don't affect the row count, under-measuring
    // pure-projection queries. The noop sink consumes all rows/columns
    // (equivalent work to a write, minus IO) with no type restrictions.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm up session/codegen paths so the first timed query isn't charged
    // for JVM+Spark startup (measures queries, not initialization).
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // A failing query must be VISIBLE, not a suspiciously-fast timing: the
    // round-2 bench recorded a broken query as 0.1s and its absence from
    // the correctness dump was the only trace. Failures land in an
    // "errors" map (and stderr) alongside the timings.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Adaptive repeats (r9): a fixed 3 runs × 200+ queries tripled bench
    // wall time as the registry grew (the driver gate is wall time). Noise
    // policy instead of blanket repeats:
    //   - first run > SoloCutoff s → record it alone (expensive queries are
    //     work-dominated, proportionally least noisy, and costliest to
    //     repeat — exactly where blanket repeats burn the most wall time);
    //   - else run twice; if the pair agrees within 10% record the MIN
    //     (both runs bound the true cost from above; min sheds one-sided
    //     noise) — only a disagreeing pair pays a tie-break 3rd run and
    //     records the median.
    // SPARK_GRAFT_BENCH_RUNS=N forces the old fixed-N lower-median policy
    // for apples-to-apples re-measurement (QueryTimer uses that path).
    val fixedRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt)
    val SoloCutoff = 4.0
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      def run1(): Unit = if (!failed) {
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); times += (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            failed = true
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            System.err.println(s"[bench] $name FAILED: ${errors(name)}")
        }
      }
      val recorded: Double = fixedRuns match {
        case Some(n) => // legacy fixed-N lower median
          (1 to n).foreach(_ => run1())
          if (failed || times.isEmpty) 0.0
          else times.sorted.apply((times.size - 1) / 2)
        case None =>
          run1()
          if (!failed && times.head <= SoloCutoff) {
            run1()
            if (!failed && times.size == 2 &&
              (times.max - times.min) / times.min > 0.10) run1()
          }
          // A FAILED query always reports 0.0 — even when earlier runs
          // succeeded — so a nonzero timing is a reliable success signal;
          // the failure record lives in `errors`.
          if (failed || times.isEmpty) 0.0
          else if (times.size <= 2) times.min
          else times.sorted.apply((times.size - 1) / 2)
      }
      name -> recorded
    }
    // escape quote/backslash and ALL control chars — a stray control byte
    // in an exception message must not break the one JSON line this prints
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Machine-load calibration: a fixed CPU-bound aggregation whose cost is
    // independent of the query set. Round-over-round totals drift ±30% with
    // box load (every query moves uniformly); dividing by calib_s separates
    // "the machine was busy" from "a query regressed".
    // A calib failure must never eat the bench line (same rule as query
    // failures): fall back to -1.0 and keep printing.
    val calib = try {
      val reps = 3
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 50000000L, 1, cpus.toInt)
          .selectExpr("sum((id * 2654435761) % 1000000007) AS s").collect()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply((reps - 1) / 2)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] calib FAILED: ${e.getMessage}"); -1.0
    }
    // "total_s" is deliberately the LAST key: the driver stores only the log
    // TAIL, so early keys (including per-query timings) can truncate away —
    // the headline number must survive at the end of the line.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","calib_s":$calib,"total_s":$total}"""
    println(line)
    // The driver's stdout-tail capture truncated 74 of 132 per-query times
    // in round 7 ("parsed": null) — the file copy is the durable record for
    // regression tracking. Best-effort: a write failure must not fail the
    // bench (the stdout line above already carries the headline).
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_last.json write FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
