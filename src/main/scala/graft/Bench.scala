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
    val benchOutPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")
    // Per-query records from the LAST bench run: the spike guard below
    // compares a first run against the query's own history, so a one-off
    // load spike (r9: q14_string_funcs 0.35s -> 21.8s with unchanged code)
    // earns a confirming rerun instead of becoming the official number.
    // Parsed with a narrow regex — the file is this program's own one-line
    // JSON with bare identifier keys and plain numeric values.
    val prior: Map[String, Double] = try {
      val p = java.nio.file.Paths.get(benchOutPath)
      if (java.nio.file.Files.exists(p)) {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        """"queries":\{([^}]*)\}""".r.findFirstMatchIn(s).map { m =>
          """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(m.group(1))
            .map(x => x.group(1) -> x.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
      } else Map.empty
    } catch { case _: Throwable => Map.empty[String, Double] }
    // Superseded capstones (x90-x93) are verified by Verify/selfcheck but
    // not re-timed: their stages are strict subsets of the newest capstone
    // (x127), so benching all five re-ran ~70s of identical work per round.
    val benched = Registry.all.filterNot(_.benchSkip)
    val skipped = Registry.all.filter(_.benchSkip).map(_.name)
    if (skipped.nonEmpty)
      System.err.println(s"[bench] benchSkip (verified, not timed): ${skipped.mkString(", ")}")
    val results = benched.map { q =>
      val (name, fn) = (q.name, q.fn)
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
        } finally {
          // Drop this run's localCheckpoint blocks (UNTIMED). Without
          // this, ~80 checkpointing queries accumulate storage blocks
          // across the sweep until the unified-memory storage pool
          // saturates and every later heavy query pays eviction/spill:
          // measured r10, x127 ran 33 s late in a full idle-box sweep
          // vs 11 s in a fresh JVM — reproducibly, with BOTH spike-guard
          // runs at 33 s. Each timed run now starts with a clean pool.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
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
          } else if (!failed &&
            prior.get(name).forall(p => p <= 0 || times.head > 3 * p)) {
            // Spike guard: expensive AND either >3x this query's last
            // record (presumably unchanged code) OR a FIRST-APPEARANCE
            // query with no record to defend it (r10's x178 recorded a
            // 22.6s load spike officially while three re-measurements said
            // 9-11s, exactly because new queries skipped this guard) — one
            // confirming rerun; min of the two bounds the true cost from
            // above. A genuinely slow new/changed query pays one extra run
            // the first round, then its record updates and the guard
            // relaxes to the 3x-of-prior condition.
            System.err.println(
              f"[bench] $name spike-guard rerun: first=${times.head}%.2fs prior=${prior.getOrElse(name, -1.0)}%.2fs")
            run1()
          }
          // A FAILED query always reports 0.0 — even when earlier runs
          // succeeded — so a nonzero timing is a reliable success signal;
          // the failure record lives in `errors`.
          if (failed || times.isEmpty) 0.0
          else if (times.size <= 2) times.min
          else times.sorted.apply((times.size - 1) / 2)
      }
      name -> recorded
    }.toMap
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
    // "policy" stamps the measurement epoch (r8: fixed lower-median-of-3;
    // r9: adaptive min-of-2/solo; r10: + spike-guard rerun + benchSkip) so
    // cross-round tooling can refuse mixed-policy diffs (ADVICE r9).
    val policy = fixedRuns.map(n => s"fixed-$n").getOrElse("adaptive-v2-spikeguard")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","policy":"$policy","bench_skipped":${skipped.size},"queries":$qs,"errors":$errs,"sf":"$sfDir","calib_s":$calib,"total_s":$total}"""
    println(line)
    // The driver's stdout-tail capture truncated 74 of 132 per-query times
    // in round 7 ("parsed": null) — the file copy is the durable record for
    // regression tracking. Best-effort: a write failure must not fail the
    // bench (the stdout line above already carries the headline).
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(benchOutPath),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_last.json write FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
