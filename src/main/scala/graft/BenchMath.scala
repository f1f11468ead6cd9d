package graft

/** The pure math of bench policy v6 ("adaptive-v6-dualprobe"), factored out
  * of [[Bench]] so the decorrelation fix the r15 verdict asked for is unit-
  * testable without a Spark session (BenchMathSpec replays the r15 official
  * sweep's failure shape: CPU probe ramps 3.6x, shuffle throughput flat,
  * mixed queries flat — v5's pure-CPU normalization manufactured 39 false
  * suspects; v6's per-query blend must not).
  *
  * Model: a query's wall time decomposes into a CPU-shaped part (tracks the
  * tight-loop arithmetic probe) and a shuffle-shaped part (tracks the
  * full-row repartition probe: serialization + shuffle file IO). The two
  * probes are the axes; each query sits between them with a measured mix
  * weight w ∈ [0, 0.95]:
  *
  *   norm_q = (1 - w) * cpuProbe + w * shuffleProbe / basisRatio
  *
  * where basisRatio = shuffleProbe/cpuProbe on the BASIS box (pinned once
  * in the artifact as "probe_basis" and carried forward verbatim). On the
  * basis box norm_q == cpuProbe for every w, so ratios seconds/norm_q are
  * in the SAME calib units as the v5 records — history stays comparable —
  * while on a box whose CPU speed and shuffle throughput diverge, norm_q
  * moves with the query's own mix instead of with the CPU probe alone. */
object BenchMath {

  /** Per-query blended normalizer (seconds). Falls back to the pure-CPU
    * probe when the shuffle probe or the basis is unavailable (first v6
    * sweep against a v5 artifact, or an all-failed shuffle probe column)
    * — i.e. degrades to exactly the v5 behavior. */
  def norm(cpuProbe: Double, shuffleProbe: Double, basisRatio: Double,
           w: Double): Double =
    if (cpuProbe <= 0) -1.0
    else if (shuffleProbe <= 0 || basisRatio <= 0 || w <= 0) cpuProbe
    else (1 - w) * cpuProbe + w * shuffleProbe / basisRatio

  /** Shuffle share of one run, from task-metric bytes calibrated by the
    * shuffle probe's own bytes/second: estimated shuffle-seconds =
    * probeSecs * (runShuffleBytes / probeShuffleBytes), and w is that as a
    * fraction of the run's wall seconds, clamped to [0, 0.95] (a query is
    * never normalized by the shuffle probe alone — the residual 5% keeps a
    * degenerate bytes estimate from erasing the CPU axis). Bytes are
    * write+read totals on both sides, so the units cancel. */
  def mixWeight(runSecs: Double, runShuffleBytes: Double,
                probeSecs: Double, probeShuffleBytes: Double): Double =
    if (runSecs <= 0 || runShuffleBytes <= 0 ||
        probeSecs <= 0 || probeShuffleBytes <= 0) 0.0
    else math.min(0.95,
      math.max(0.0, probeSecs * (runShuffleBytes / probeShuffleBytes) / runSecs))

  /** Nearest-valid probe lookup (ADVICE r15: a failed start probe must
    * BORROW a later probe, never normalize by 1.0 and commit artificially
    * low records). `probes(i) <= 0` marks a failed probe. Preference: the
    * smaller of the two probes bracketing segment `seg` (probes are
    * upward-noisy — an interjection slows one, nothing speeds one); if
    * both failed, the nearest valid probe in either direction; -1 only if
    * EVERY probe in the sweep failed. */
  def localProbe(probes: IndexedSeq[Double], seg: Int): Double = {
    val n = probes.size
    if (n == 0) return -1.0
    val i = math.min(math.max(seg, 0), n - 1)
    val j = math.min(i + 1, n - 1)
    val bracket = Seq(probes(i), probes(j)).filter(_ > 0)
    if (bracket.nonEmpty) bracket.min
    else {
      var d = 1
      while (d < n) {
        if (i - d >= 0 && probes(i - d) > 0) return probes(i - d)
        if (j + d < n && probes(j + d) > 0) return probes(j + d)
        d += 1
      }
      -1.0
    }
  }

  /** Median of the VALID probes — the sweep's canonical box number. */
  def medianValid(probes: Seq[Double]): Double = {
    val v = probes.filter(_ > 0).sorted
    if (v.isEmpty) -1.0 else v(v.size / 2)
  }

  /** GENEROUS probe for suspicion gates: max(local min-bracket, sweep
    * median). The two probe uses need OPPOSITE conservatism (measured in
    * the r16 sweep-2 shape): committed records must ratchet only on the
    * FASTEST defensible box estimate (min-bracket — a probe can read fast
    * only by actually running fast), while a false SUSPECT is manufactured
    * by exactly that same fast dip when the box oscillates between CPU
    * states faster than the probe cadence — 12 of sweep-2's 14 suspects
    * had raw seconds equal to sweep-1's, flagged because one 0.053s probe
    * dip amid a 0.10s median poisoned its two segments. Flooring the gate
    * probe at the sweep median keeps a dip from indicting 50 queries
    * while a locally-slow patch (localMin > median) still widens the gate
    * as before. Records NEVER use this. */
  def gateProbe(probes: IndexedSeq[Double], seg: Int): Double = {
    val local = localProbe(probes, seg)
    val med = medianValid(probes)
    if (local <= 0) med else math.max(local, med)
  }

  /** Committed record merge: min-across-sweeps unless `fresh` resets it
    * (the escape hatch for INTENTIONAL slowdowns). */
  def mergeRecord(cur: Option[Double], prior: Option[Double],
                  fresh: Boolean): Double =
    if (fresh) cur.orElse(prior).getOrElse(0.0)
    else (cur, prior) match {
      case (Some(c), Some(p)) => math.min(c, p)
      case (Some(c), None)    => c
      case (None, Some(p))    => p
      case _                  => 0.0
    }
}
