package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Box-state probe logged around spiked queries so a persistent
    * degradation is DIAGNOSABLE from the bench log instead of guessed at
    * (VERDICT r11: x268 ran 66s officially vs 12.8s committed and the
    * min-of-two rerun was slow too — nothing recorded WHY). */
  private def boxState(spark: SparkSession): String = {
    import scala.jdk.CollectionConverters._
    val gcMs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val heap = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage
    val tmpFreeGb = new java.io.File("/tmp").getUsableSpace / 1e9
    val rdds = spark.sparkContext.getPersistentRDDs.size
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    f"gc_total=${gcMs}ms heap=${heap.getUsed / 1e9}%.1f/${heap.getMax / 1e9}%.1fGB " +
      f"tmp_free=$tmpFreeGb%.0fGB persistent_rdds=$rdds load1m=$load%.1f"
  }

  private def newSession(cpus: String): SparkSession = {
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
    spark
  }

  /** Monotonic shuffle-bytes meter (write+read totals across all tasks on
    * this session). Callers take deltas around a run; reads drain the
    * async listener bus first so a run's last task-end events are counted
    * (GraftSparkHooks — never on a timed path). */
  private final class ShuffleMeter(sc: org.apache.spark.SparkContext) {
    private val bytes = new java.util.concurrent.atomic.AtomicLong()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) bytes.addAndGet(
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead)
      }
    })
    def read(): Long = {
      org.apache.spark.GraftSparkHooks.drainListenerBus(sc)
      bytes.get()
    }
  }

  /** CPU-shaped calibration probe: a fixed tight-loop aggregation whose
    * cost is independent of the query set — one axis of the v6 unit in
    * which committed records are comparable across boxes/rounds. One
    * UNTIMED warmup run (the first execution pays codegen/JIT — measured
    * start probes of 0.35–0.81s vs a 0.07s steady state in the r14 sweeps)
    * then the MIN of `reps` (box capability; min sheds one-sided GC
    * interjections). */
  private def calibProbe(spark: SparkSession, cpus: Int, reps: Int = 3): Double =
    try {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 50000000L, 1, cpus)
          .selectExpr("sum((id * 2654435761) % 1000000007) AS s").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup, discarded
      (0 until reps).map(_ => once()).min
    } catch { case e: Throwable =>
      System.err.println(s"[bench] calib FAILED: ${e.getMessage}"); -1.0
    }

  /** Shuffle-shaped calibration probe (v6, r15 verdict #1): a fixed
    * full-row repartition — every row hash-partitioned, serialized,
    * written to shuffle files and read back, with only a trivial count on
    * top — so its seconds track the box's shuffle/serialization/disk
    * throughput the way [[calibProbe]] tracks its arithmetic throughput.
    * The r15 official sweep proved the two CAN diverge 3.6x on one box
    * while query times hold still; normalizing a mixed CPU/shuffle query
    * by the CPU probe alone is what manufactured 39 false suspects.
    * Returns (min-of-reps seconds, shuffle bytes of one run) — the bytes
    * calibrate per-query mix weights (BenchMath.mixWeight). */
  private def shuffleProbe(spark: SparkSession, cpus: Int,
                           meter: ShuffleMeter, reps: Int = 3): (Double, Double) =
    try {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 3000000L, 1, cpus)
          .selectExpr("id AS k", "id * 2654435761 AS v")
          .repartition(org.apache.spark.sql.functions.col("k"))
          .selectExpr("count(v) AS c").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup, discarded
      val b0 = meter.read()
      val t1 = once()
      val bytes = (meter.read() - b0).toDouble
      val t = (t1 +: (1 until reps).map(_ => once())).min
      (t, bytes)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] shuffle calib FAILED: ${e.getMessage}"); (-1.0, 0.0)
    }

  /** r14 judge finding: a single start-of-sweep calibration scalar cannot
    * model INTRA-sweep drift — the official r14 sweep degraded mid-run and
    * flagged 19 false suspects at start-ratio 0.963, and position skew
    * doubled x179/x180's committed records on unchanged code. Policy v5
    * answered with interleaved CPU probes every [[ProbeEvery]] queries,
    * per-query nearest-probe normalization, min-across-sweeps records in
    * calib units, and seed-shuffled order. r15's residual: the CPU probe
    * alone DECORRELATES from mixed CPU/shuffle queries when a box's
    * arithmetic and shuffle throughput drift apart (official r15 sweep:
    * probe ramped 0.144→0.039s, queries flat, 39 false suspects). Policy
    * v6 ("adaptive-v6-dualprobe") therefore interleaves a SECOND,
    * shuffle-shaped probe and normalizes every query by a per-query blend
    * of the two probes, weighted by the query's own measured shuffle share
    * (BenchMath). Records stay in the same units (on the pinned basis box
    * the blend equals the CPU probe), so v5 history carries forward. */
  private val ProbeEvery = 25

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var spark = newSession(cpus)
    var meter = new ShuffleMeter(spark.sparkContext)
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
    // (The pre-v6 SPARK_GRAFT_BENCH_RUNS fixed-N branch is deleted — r15
    // verdict #8: nothing used it; QueryTimer has its own median-of-3.)
    val SoloCutoff = 4.0
    val benchOutPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")
    // Per-query records from the LAST bench run — in the driver's official
    // sweep this is the COMMITTED builder record, which makes it double
    // duty: (a) the spike guard compares a first run against the query's
    // own history so a one-off load spike earns a confirming rerun instead
    // of becoming the official number; (b) the output line re-emits it as
    // "committed" next to the official timings so official-vs-committed
    // divergence is self-describing (VERDICT r11 #8). Parsed with a narrow
    // regex — the file is this program's own one-line JSON with bare
    // identifier keys and plain numeric values.
    def parseQueriesMap(s: String, key: String): Map[String, Double] =
      (s""""$key":\\{([^}]*)\\}""").r.findFirstMatchIn(s).map { m =>
        """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(m.group(1))
          .map(x => x.group(1) -> x.group(2).toDouble).toMap
      }.getOrElse(Map.empty)
    def parseNum(s: String, key: String): Double =
      try (s""""$key":([-0-9.eE]+)""").r
        .findFirstMatchIn(s).map(_.group(1).toDouble).getOrElse(-1.0)
      catch { case _: Throwable => -1.0 }
    val priorFile: String = try {
      val p = java.nio.file.Paths.get(benchOutPath)
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      else ""
    } catch { case _: Throwable => "" }
    // parse failures must never eat the bench line (r14 review: the move
    // out of the file-read try left .toDouble able to crash main)
    val priorQueries: Map[String, Double] =
      try parseQueriesMap(priorFile, "queries")
      catch { case _: Throwable => Map.empty[String, Double] }
    // Prior RECORDS in calib units. A v5+ file carries them directly; a
    // legacy (pre-v5) file is converted via its END-of-sweep probe — the
    // stable box number (the r14 PLANS analysis: start probes read
    // 0.35–0.81s on an identical-speed box, end probes 0.073–0.090s).
    // ADVICE r14: the transition must not gate against an incomparable
    // calibration number — legacy-derived records get a 1.5x slack on
    // every gate for this one sweep.
    val priorIsV5 = priorFile.contains("\"records\":")
    val priorRecords: Map[String, Double] =
      if (priorIsV5)
        try parseQueriesMap(priorFile, "records")
        catch { case _: Throwable => Map.empty[String, Double] }
      else {
        val endProbe = parseNum(priorFile, "calib_end_s")
        val basis = if (endProbe > 0) endProbe else parseNum(priorFile, "calib_s")
        if (basis > 0) priorQueries.map { case (k, v) => k -> v / basis }
        else Map.empty[String, Double]
      }
    val transitionSlack = if (priorIsV5 || priorRecords.isEmpty) 1.0 else 1.5
    if (transitionSlack != 1.0)
      System.err.println(
        s"[bench] prior file is pre-v5 — records derived from its end probe, gates widened x$transitionSlack for this sweep")
    // Record floor in calib units: gates only fire for queries whose prior
    // record is at least ~0.5s of work on the r13/r14 reference box
    // (probe ~0.085s) — sub-half-second queries are noise-dominated.
    val RecordFloor = 6.0
    val freshRecords: Set[String] =
      sys.env.get("SPARK_GRAFT_FRESH_RECORDS").map(_.split(",").map(_.trim).toSet)
        .getOrElse(Set.empty)

    val calibStart = calibProbe(spark, cpus.toInt)
    val (shCalibStart, shProbeBytes0) = shuffleProbe(spark, cpus.toInt, meter)
    // calib_ratio is retained as a DIAGNOSTIC (start probe vs prior sweep's
    // canonical probe); gates no longer use it — local probes subsume it.
    val priorCalib = parseNum(priorFile, "calib_s")
    val calibRatio: Double =
      if (calibStart > 0 && priorCalib > 0)
        math.max(0.25, math.min(4.0, calibStart / priorCalib))
      else 1.0
    // Basis ratio: shuffleProbe/cpuProbe on the box the records mean
    // "1 calib unit" on. Pinned ONCE in the artifact ("probe_basis") and
    // carried forward verbatim so the unit never drifts; the first v6
    // sweep establishes it from its own probe medians (and until the end
    // of that sweep uses its start pair as the provisional value — the
    // gates it feeds carry 2-3x margins).
    val priorBasis = parseNum(priorFile, "probe_basis")
    var basisRatio: Double =
      if (priorBasis > 0) priorBasis
      else if (calibStart > 0 && shCalibStart > 0) shCalibStart / calibStart
      else -1.0
    System.err.println(
      f"[bench] calib_start=$calibStart%.3fs shuffle_start=$shCalibStart%.3fs (${shProbeBytes0 / 1e6}%.0f MB) prior_calib=$priorCalib%.3fs probe_basis=$basisRatio%.3f calib_ratio=$calibRatio%.3f (diagnostic)")

    // Superseded capstones / strictly-contained family members are
    // verified by Verify/selfcheck but not re-timed (benchSkip).
    val benched = Registry.all.filterNot(_.benchSkip)
    val skipped = Registry.all.filter(_.benchSkip).map(_.name)
    if (skipped.nonEmpty)
      System.err.println(s"[bench] benchSkip (verified, not timed): ${skipped.mkString(", ")}")

    // Warm-touch first-appearance queries (r15 verdict #3): a query with
    // no committed record gets one UNTIMED materialization at the smallest
    // available SF before the sweep, so its first timed run measures the
    // query, not first-touch JIT of a brand-new code path (x387's official
    // r15 first record was 6.38s vs a 0.75s warm wrap for exactly this
    // reason). sf0.001 keeps the touch to ~a second; errors are swallowed
    // here and surface in the timed run.
    val firstAppearance = benched.filter(q => !priorRecords.contains(q.name))
    if (firstAppearance.nonEmpty) {
      val warmDir = {
        val p = java.nio.file.Paths.get(sfDir)
        val sib = Option(p.getParent).map(_.resolve("sf0.001"))
        sib.filter(java.nio.file.Files.exists(_)).map(_.toString).getOrElse(sfDir)
      }
      System.err.println(s"[bench] warm-touch (untimed, $warmDir) for ${firstAppearance.size} first-appearance quer${if (firstAppearance.size == 1) "y" else "ies"}: ${firstAppearance.map(_.name).mkString(", ")}")
      firstAppearance.foreach { q =>
        try materialize(q.fn(spark, warmDir)) catch { case _: Throwable => () }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    // Seed-shuffled sweep order (policy v5 #3). The seed is logged in the
    // artifact so any sweep is reproducible.
    val orderSeed = sys.env.get("SPARK_GRAFT_ORDER_SEED").map(_.toLong)
      .getOrElse(System.nanoTime())
    val order = new scala.util.Random(orderSeed).shuffle(benched.toVector)
    System.err.println(s"[bench] order_seed=$orderSeed")

    /** One timed noop-materialization of `q` on the CURRENT session;
      * returns seconds or None on failure (recorded in `errors`). */
    def run1(q: QueryDef): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        materialize(q.fn(spark, sfDir))
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          System.err.println(s"[bench] ${q.name} FAILED: ${errors(q.name)}")
          None
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

    // Queries whose spike PERSISTED across the immediate rerun: the
    // degrading condition survives a same-session rerun (VERDICT r11: x268
    // was ~66s on BOTH runs vs a 12.8s committed record), so min-of-two
    // cannot recover. These retry at sweep end under CHANGED conditions —
    // a fresh SparkSession after the rest of the sweep's pressure is gone.
    val deferred = scala.collection.mutable.ArrayBuffer.empty[QueryDef]
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // per-query segment index (which interleaved probe pair brackets it);
    // -1 marks "best measurement came from the fresh-session retry pass"
    val segOf = scala.collection.mutable.HashMap[String, Int]()
    // per-query shuffle-mix weight (BenchMath.mixWeight from the first
    // run's task-metric bytes) — emitted in the artifact as "probe_mix"
    val mixOf = scala.collection.mutable.HashMap[String, Double]()
    // Interleaved probe columns; <= 0 marks a FAILED probe (ADVICE r15:
    // never normalize by a made-up 1.0 — BenchMath.localProbe borrows the
    // nearest valid probe instead, and an all-failed CPU column disables
    // record commits for the sweep entirely).
    val cpuProbes = scala.collection.mutable.ArrayBuffer[Double](calibStart)
    val shProbes = scala.collection.mutable.ArrayBuffer[Double](shCalibStart)
    var shProbeBytes = math.max(shProbeBytes0, 1.0)

    order.zipWithIndex.foreach { case (q, qi) =>
      if (qi > 0 && qi % ProbeEvery == 0) {
        cpuProbes += calibProbe(spark, cpus.toInt)
        val (shP, shB) = shuffleProbe(spark, cpus.toInt, meter)
        shProbes += shP
        if (shB > 0) shProbeBytes = shB
        System.err.println(f"[bench] probe[${cpuProbes.size - 1}]=${cpuProbes.last}%.3fs shuffle=${shProbes.last}%.3fs after $qi queries")
      }
      val seg = qi / ProbeEvery
      segOf(q.name) = seg
      val name = q.name
      // Per-query GATE normalizer at THIS point in the sweep: blend of
      // the GENEROUS probes (max of local bracket and running median —
      // BenchMath.gateProbe; a momentary fast probe dip must not indict
      // its segments), weighted by the query's own shuffle share (known
      // after the first run). Falls back to pure CPU (v5) until the
      // mix/shuffle probe exists. Records never use this normalizer —
      // they keep the conservative min-bracket (see normFor below).
      def normHere: Double = {
        val c = BenchMath.gateProbe(cpuProbes.toIndexedSeq, seg)
        val s = BenchMath.gateProbe(shProbes.toIndexedSeq, seg)
        BenchMath.norm(c, s, basisRatio, mixOf.getOrElse(name, 0.0))
      }
      // mid-sweep gate: prior record (calib units) × the blended local
      // normalizer — the best estimate available before the closing probe.
      def gateSecs(mult: Double): Option[Double] =
        priorRecords.get(name).filter(_ > 0).filter(_ => normHere > 0)
          .map(r => mult * r * normHere * transitionSlack)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      def ok = !errors.contains(name)
      val bytes0 = meter.read()
      run1(q).foreach(times += _)
      if (times.nonEmpty)
        mixOf(name) = BenchMath.mixWeight(
          times.head, (meter.read() - bytes0).toDouble,
          BenchMath.localProbe(shProbes.toIndexedSeq, seg), shProbeBytes)
      if (ok && times.nonEmpty && times.head <= SoloCutoff) {
        run1(q).foreach(times += _)
        if (ok && times.size == 2 &&
          (times.max - times.min) / times.min > 0.10) run1(q).foreach(times += _)
      } else if (ok && times.nonEmpty &&
        gateSecs(3.0).forall(g => times.head > g)) {
        // Spike guard: expensive AND either >3x this query's record
        // (presumably unchanged code) OR a FIRST-APPEARANCE query with
        // no record to defend it (r10's x178 recorded a 22.6s load
        // spike officially while three re-measurements said 9-11s,
        // exactly because new queries skipped this guard) — one
        // confirming rerun; min of the two bounds the true cost from
        // above. If BOTH runs spike the condition is persistent and a
        // same-session rerun proves nothing: log the box state and
        // defer to the fresh-session retry pass.
        System.err.println(
          f"[bench] $name spike-guard rerun: first=${times.head}%.2fs record=${priorRecords.getOrElse(name, -1.0)}%.2fxcal norm=$normHere%.3fs mix=${mixOf.getOrElse(name, 0.0)}%.2f ${boxState(spark)}")
        run1(q).foreach(times += _)
        if (ok && times.size == 2 && gateSecs(3.0).exists(g => times.min > g)) {
          System.err.println(
            f"[bench] $name spike PERSISTED (${times.mkString("s, ")}s) — deferring to fresh-session retry ${boxState(spark)}")
          deferred += q
        }
      }
      val recorded: Double =
        if (!ok || times.isEmpty) 0.0
        else if (times.size <= 2) times.min
        else times.sorted.apply((times.size - 1) / 2)
      results(name) = recorded
      // The 2-3x band escaped r12's guard: the in-place spike rerun fires
      // at >3x record but the suspect flag at >2x, so a 2.5x entry was
      // flagged suspect WITHOUT ever being re-measured under changed
      // conditions. Any entry still >2x its record after its in-sweep
      // runs joins the fresh-session retry pass.
      if (!errors.contains(name) && normHere > 0 &&
          priorRecords.get(name).exists(r => r > RecordFloor &&
            recorded > 2 * r * normHere * transitionSlack) &&
          !deferred.exists(_.name == name)) {
        System.err.println(
          f"[bench] $name >2x committed record ($recorded%.2fs vs ${priorRecords(name)}%.2fxcal at norm $normHere%.3fs) — deferring to fresh-session retry ${boxState(spark)}")
        deferred += q
      }
    }
    // closing probes: every segment has a probe pair on BOTH sides
    cpuProbes += calibProbe(spark, cpus.toInt)
    val (shEnd, shEndB) = shuffleProbe(spark, cpus.toInt, meter)
    shProbes += shEnd
    if (shEndB > 0) shProbeBytes = shEndB
    val calibEnd = cpuProbes.last

    // Fresh-session retry pass: changed conditions, not repeated ones.
    // Bounded — if MANY queries spiked the box itself is degraded (the
    // local probes divide that out) and re-running a third of the sweep
    // would double wall time for no signal.
    var retryCpuProbe = -1.0
    var retryShProbe = -1.0
    if (deferred.nonEmpty && deferred.size <= 12) {
      System.err.println(
        s"[bench] fresh-session retry for ${deferred.size} persistent spike(s): ${deferred.map(_.name).mkString(", ")}")
      spark.stop()
      spark = newSession(cpus)
      meter = new ShuffleMeter(spark.sparkContext)
      try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
      retryCpuProbe = calibProbe(spark, cpus.toInt)
      val (rsP, rsB) = shuffleProbe(spark, cpus.toInt, meter)
      retryShProbe = rsP
      if (rsB > 0) shProbeBytes = rsB
      deferred.foreach { q =>
        val retries = scala.collection.mutable.ArrayBuffer.empty[Double]
        run1(q).foreach(retries += _)
        if (!errors.contains(q.name)) run1(q).foreach(retries += _)
        // Every deferred query already SUCCEEDED in the main sweep (it was
        // deferred for being slow, not for failing) — a retry-pass failure
        // is the fresh session's environment, not the query. Any retry run
        // that DID succeed is a valid changed-conditions measurement and
        // must still count (r13 code-review); then drop the spurious error
        // so a nonzero timing and an error entry stay mutually exclusive.
        if (errors.contains(q.name)) {
          System.err.println(
            s"[bench] ${q.name} fresh-session retry error (${errors(q.name)}) — environmental; keeping timing evidence, clearing error")
          errors.remove(q.name)
        }
        if (retries.nonEmpty) {
          val best = math.min(results(q.name), retries.min)
          // if the retry produced the better number, its probes are the
          // ones that normalize it
          if (retries.min < results(q.name) && retryCpuProbe > 0) segOf(q.name) = -1
          System.err.println(
            f"[bench] ${q.name} fresh-session retry: ${retries.map(t => f"$t%.2f").mkString("s, ")}s main=${results(q.name)}%.2fs recorded=$best%.2fs ${boxState(spark)}")
          results(q.name) = best
        }
      }
    } else if (deferred.size > 12) {
      System.err.println(
        s"[bench] ${deferred.size} persistent spikes — box-wide degradation, skipping retry pass (local probes are the divisor)")
    }

    // An all-failed CPU probe column means NOTHING can be normalized this
    // sweep: commit no records, flag no suspects, stamp the artifact
    // (ADVICE r15 — a probe-less sweep must not write artificially low
    // records that later sweeps can never beat).
    val calibFailed = !cpuProbes.exists(_ > 0)
    if (calibFailed)
      System.err.println("[bench] EVERY cpu probe failed — records carried forward unchanged, no suspects flagged")

    // If the basis wasn't inherited, pin it now from this sweep's medians
    // (more robust than the provisional start pair the gates used).
    val medCpu = BenchMath.medianValid(cpuProbes.toSeq)
    val medSh = BenchMath.medianValid(shProbes.toSeq)
    if (priorBasis <= 0 && medCpu > 0 && medSh > 0) {
      basisRatio = medSh / medCpu
      System.err.println(f"[bench] probe_basis established: $basisRatio%.3f (= $medSh%.3f / $medCpu%.3f)")
    }

    // Ratios (v6 calib units) for every query: seconds / blended local
    // normalizer. segOf == -1 marks "retry-pass measurement" → retry
    // probes. Two normalizers with OPPOSITE conservatism (r16 sweep-2
    // finding, BenchMath.gateProbe doc): RECORD ratios divide by the
    // min-bracket probe (ratchet only on the fastest defensible box
    // estimate), SUSPECT ratios divide by the generous median-floored
    // probe (a fast dip must not manufacture suspects).
    def normWith(pick: (IndexedSeq[Double], Int) => Double)(name: String): Double = {
      val seg = segOf.getOrElse(name, 0)
      val (c, s) =
        if (seg == -1 && retryCpuProbe > 0) (retryCpuProbe, retryShProbe)
        else (pick(cpuProbes.toIndexedSeq, seg), pick(shProbes.toIndexedSeq, seg))
      BenchMath.norm(c, s, basisRatio, mixOf.getOrElse(name, 0.0))
    }
    val normFor = normWith(BenchMath.localProbe) _
    val gateNormFor = normWith(BenchMath.gateProbe) _
    val ratios: Map[String, Double] = results.collect {
      case (name, t) if t > 0 && !errors.contains(name) && normFor(name) > 0 =>
        name -> t / normFor(name)
    }.toMap
    val gateRatios: Map[String, Double] = results.collect {
      case (name, t) if t > 0 && !errors.contains(name) && gateNormFor(name) > 0 =>
        name -> t / gateNormFor(name)
    }.toMap

    // Committed records: min-across-sweeps in calib units (policy v5 #2).
    // A name in SPARK_GRAFT_FRESH_RECORDS resets to this sweep's ratio
    // (the escape hatch for INTENTIONAL slowdowns); a query absent from
    // this sweep (error / benchSkip / failed probes) carries its prior
    // record forward so one bad sweep can't erase history.
    val records: Map[String, Double] = {
      val names = (ratios.keySet ++ priorRecords.keySet)
        .filter(n => Registry.byName.contains(n))
      names.map { n =>
        val cur = if (calibFailed) None else ratios.get(n)
        val pri = priorRecords.get(n).filter(_ > 0)
        n -> BenchMath.mergeRecord(cur, pri, freshRecords.contains(n))
      }.filter(_._2 > 0).toMap
    }

    // Self-describing divergence (VERDICT r11 #8): any entry whose ratio is
    // still >2x its committed record after the retry pass is flagged
    // suspect IN THE ARTIFACT, so the judge reads the divergence directly
    // instead of reconstructing it from git.
    val suspect =
      if (calibFailed) Seq.empty[String]
      else gateRatios.collect {
        case (name, r) if priorRecords.get(name).exists(p =>
          p > RecordFloor && r > 2 * p * transitionSlack) => name
      }.toSeq.sorted
    if (suspect.nonEmpty)
      System.err.println(
        s"[bench] SUSPECT (>2x committed record in calib units): ${suspect.mkString(", ")}")

    // escape quote/backslash and ALL control chars — a stray control byte
    // in an exception message must not break the one JSON line this prints
    // (shared impl: one escaper in the codebase, not two divergent copies)
    def jstr(s: String) = graft.sources.HttpPageClient.jstr(s)
    def numMap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + (math.rint(v * 10000) / 10000) }
        .mkString("{", ",", "}")
    val qs = numMap(results)
    val committedJson = numMap(priorQueries.toSeq.sortBy(_._1))
    val recordsJson = numMap(records.toSeq.sortBy(_._1))
    val priorRecordsJson = numMap(priorRecords.toSeq.sortBy(_._1))
    val mixJson = numMap(mixOf.toSeq.sortBy(_._1))
    def probeArr(ps: Seq[Double]): String =
      ps.map(p => math.rint(p * 10000) / 10000).mkString("[", ",", "]")
    val suspectJson = suspect.map(jstr).mkString("[", ",", "]")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // calib_s stays the cross-round comparable number. Under v5+ the
    // canonical probe is the MEDIAN of the interleaved probes — robust to
    // both the start-of-JVM inflation (r14: start probes 4-9x the steady
    // state even after an untimed warmup) and to end-of-sweep outliers.
    val calib = medCpu
    // "total_s" is deliberately the LAST key: the driver stores only the log
    // TAIL, so early keys (including per-query timings) can truncate away —
    // the headline number must survive at the end of the line.
    // "policy" stamps the measurement epoch (r8: fixed lower-median-of-3;
    // r9: adaptive min-of-2/solo; r10: + spike-guard rerun + benchSkip;
    // r12: + fresh-session deferred retry + committed/suspect fields;
    // r14: calib-normalized gates; r15: v5 — interleaved probes every 25
    // queries, per-query nearest-probe normalization, records committed in
    // calib units with min-across-sweeps, seed-shuffled order; r16: v6 —
    // second shuffle-shaped probe, per-query mix-weighted blend normalizer,
    // pinned probe_basis, warm-touch for first-appearance queries, probe
    // validity/calib_failed hygiene) so cross-round tooling can refuse
    // mixed-policy diffs (ADVICE r9).
    val policy = "adaptive-v6-dualprobe"
    val line = s"""{"metric":"total","value":$total,"unit":"sec","policy":"$policy","bench_skipped":${skipped.size},"order_seed":$orderSeed,"queries":$qs,"committed":$committedJson,"records":$recordsJson,"records_unit":"xcalib_probe","prior_records":$priorRecordsJson,"probes":${probeArr(cpuProbes.toSeq)},"shuffle_probes":${probeArr(shProbes.toSeq)},"probe_mix":$mixJson,"probe_basis":${math.rint(basisRatio * 10000) / 10000},"calib_failed":$calibFailed,"calib_ratio":$calibRatio,"calib_start_s":$calibStart,"calib_end_s":$calibEnd,"prior_calib_s":$priorCalib,"calib_shuffle_s":${math.rint(medSh * 10000) / 10000},"suspect":$suspectJson,"errors":$errs,"sf":"$sfDir","calib_s":$calib,"total_s":$total}"""
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
