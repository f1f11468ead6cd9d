package graft

import org.scalatest.funsuite.AnyFunSuite

/** Policy v6 math (r15 verdict #1): the official r15 sweep manufactured 39
  * false suspects because its pure-CPU calibration probe ramped 0.144 →
  * 0.039 s while mixed CPU/shuffle queries held still — the probe and the
  * queries DECORRELATED. These tests replay that exact shape through
  * BenchMath and assert the blended normalizer keeps unchanged queries
  * inside the 2x suspect gate, plus the ADVICE r15 probe-validity cases
  * (failed start probe must borrow, not normalize by 1.0). */
class BenchMathSpec extends AnyFunSuite {

  // The r15 record basis box: cpu probe 0.0825 s. Give it a shuffle probe
  // of 0.30 s -> basisRatio pinned at 0.30 / 0.0825.
  private val basisCpu = 0.0825
  private val basisSh = 0.30
  private val basisRatio = basisSh / basisCpu

  test("r15 replay: CPU probe ramps 3.6x, shuffle flat — a flat mixed query stays inside the 2x gate") {
    // A query that is half shuffle-shaped on the basis box: record set at
    // 0.86 s -> 10.42 xcal (q00's shape). w measured at 0.5.
    val w = 0.5
    val record = 0.86 / BenchMath.norm(basisCpu, basisSh, basisRatio, w) // = 0.86/0.0825
    // Official-r15-style box: CPU probe sped to 0.039 s, shuffle
    // throughput unchanged (0.30 s), query time unchanged (0.86 s).
    val cpuNow = 0.039
    val v5ratio = 0.86 / cpuNow // pure-CPU normalization, what r15 did
    assert(v5ratio > 2 * record, f"v5 must flag this false suspect (${v5ratio / record}%.2fx)")
    val v6norm = BenchMath.norm(cpuNow, basisSh, basisRatio, w)
    val v6ratio = 0.86 / v6norm
    assert(v6ratio <= 2 * record, f"v6 blend must NOT flag it (${v6ratio / record}%.2fx)")
    // and the blend is not a blanket widening: a query that REALLY got
    // 3x slower is still flagged
    assert(3 * 0.86 / v6norm > 2 * record, "a real 3x regression must still trip the gate")
  }

  test("r15 replay: a pure-CPU query still normalizes by the CPU probe (w=0 is exactly v5)") {
    val cpuNow = 0.039
    assert(BenchMath.norm(cpuNow, basisSh, basisRatio, 0.0) === cpuNow)
    // a pure-CPU query's time DOES scale with the CPU probe, so it is not
    // a false suspect under either policy: time 0.86 * (0.039/0.0825)
    val record = 0.86 / basisCpu
    val scaledTime = 0.86 * cpuNow / basisCpu
    assert(scaledTime / cpuNow <= 2 * record)
  }

  test("on the basis box the blend equals the CPU probe for every w — v5 records stay comparable") {
    Seq(0.0, 0.25, 0.5, 0.75, 0.95).foreach { w =>
      val n = BenchMath.norm(basisCpu, basisSh, basisRatio, w)
      assert(math.abs(n - basisCpu) < 1e-12, s"w=$w: $n != $basisCpu")
    }
  }

  test("mixWeight: probe-calibrated bytes over wall seconds, clamped to [0, 0.95]") {
    // probe: 0.3 s for 100 MB -> a run shuffling 200 MB has ~0.6 s of
    // shuffle-shaped work; over a 1.2 s run that's w = 0.5
    assert(BenchMath.mixWeight(1.2, 200e6, 0.3, 100e6) === 0.5)
    // no shuffle bytes -> pure CPU
    assert(BenchMath.mixWeight(1.2, 0.0, 0.3, 100e6) === 0.0)
    // degenerate estimate above the run time clamps at 0.95, never 1.0
    assert(BenchMath.mixWeight(0.1, 900e6, 0.3, 100e6) === 0.95)
    // missing probe data -> 0 (v5 fallback), never NaN
    assert(BenchMath.mixWeight(1.2, 200e6, -1.0, 100e6) === 0.0)
    assert(BenchMath.mixWeight(1.2, 200e6, 0.3, 0.0) === 0.0)
  }

  test("norm degrades to the CPU probe when the shuffle probe or basis is unavailable") {
    assert(BenchMath.norm(0.08, -1.0, basisRatio, 0.5) === 0.08)
    assert(BenchMath.norm(0.08, 0.3, -1.0, 0.5) === 0.08)
    assert(BenchMath.norm(-1.0, 0.3, basisRatio, 0.5) === -1.0)
  }

  test("localProbe: failed start probe borrows the first valid mid-sweep probe (ADVICE r15)") {
    // segment 0 bracketed by [failed, failed]; first valid probe is idx 2
    val probes = IndexedSeq(-1.0, -1.0, 0.084, 0.081)
    assert(BenchMath.localProbe(probes, 0) === 0.084)
    // normal case: min of the bracketing pair (upward-noisy probes)
    assert(BenchMath.localProbe(IndexedSeq(0.09, 0.08, 0.12), 0) === 0.08)
    assert(BenchMath.localProbe(IndexedSeq(0.09, 0.08, 0.12), 1) === 0.08)
    // one failed bracket -> the valid side
    assert(BenchMath.localProbe(IndexedSeq(0.09, -1.0, 0.12), 1) === 0.12)
    // all failed -> -1 (caller skips record commits for the sweep)
    assert(BenchMath.localProbe(IndexedSeq(-1.0, -1.0), 0) === -1.0)
    // last segment clamps to the closing probe
    assert(BenchMath.localProbe(IndexedSeq(0.09, 0.08), 5) === 0.08)
  }

  test("r16 sweep-2 replay: a probe dip on an oscillating box must not manufacture suspects, but records stay conservative") {
    // The r16 sweep-2 shape: box runs queries at ~2x the record basis
    // (median cpu probe 0.10 vs records set at ~0.054), but one probe
    // dips to 0.053 — the box momentarily ran fast while its segment's
    // queries ran slow. q48's shape: record 25.25 xcal, raw 2.65 s.
    val probes = IndexedSeq(0.10, 0.053, 0.10, 0.11, 0.095)
    val record = 25.25
    val raw = 2.65
    // min-bracket (record normalizer) around the dip reads 0.053 →
    // gate at 2*record*0.053 = 2.68 ≈ raw: under v6.0 this flagged q48
    val minProbe = BenchMath.localProbe(probes, 1)
    assert(minProbe === 0.053)
    assert(raw / minProbe > 1.9 * record, "min-bracket normalization sits at the gate edge")
    // generous gate probe floors at the sweep median → no suspect
    val gp = BenchMath.gateProbe(probes, 1)
    assert(gp === 0.10)
    assert(raw / gp <= 2 * record, "median-floored gate must clear the flat query")
    // a genuine regression (6 s raw on the same box) IS still flagged
    assert(6.0 / gp > 2 * record)
    // a locally-SLOW patch (localMin above median) keeps the wider gate
    assert(BenchMath.gateProbe(IndexedSeq(0.10, 0.15, 0.16), 1) === 0.15)
    // all-invalid bracket falls back to the median, not -1
    assert(BenchMath.gateProbe(IndexedSeq(-1.0, -1.0, 0.1, 0.12), 0) > 0)
  }

  test("medianValid ignores failed probes; mergeRecord keeps min unless fresh") {
    assert(BenchMath.medianValid(Seq(-1.0, 0.08, 0.10, 0.09)) === 0.09)
    assert(BenchMath.medianValid(Seq(-1.0, -1.0)) === -1.0)
    assert(BenchMath.mergeRecord(Some(5.0), Some(4.0), fresh = false) === 4.0)
    assert(BenchMath.mergeRecord(Some(5.0), Some(4.0), fresh = true) === 5.0)
    assert(BenchMath.mergeRecord(None, Some(4.0), fresh = false) === 4.0)
    assert(BenchMath.mergeRecord(Some(5.0), None, fresh = false) === 5.0)
    assert(BenchMath.mergeRecord(None, None, fresh = false) === 0.0)
  }
}
