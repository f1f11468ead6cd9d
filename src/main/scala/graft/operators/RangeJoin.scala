package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows within a bounded interval of each other
  * (`0 <= b.sec - a.sec <= width`) on a shared key. The naive inequality
  * join is O(n²) per key — Catalyst can only plan it as a nested-loop
  * filter. Bucketizing by `width`-sized bands turns it into an EQUI-join:
  * a match within `width` seconds must land in the same band as `a` or the
  * next one, so `a` probes exactly two bands. Each qualifying pair matches
  * exactly once (b's band equals one specific probe value).
  *
  * Scale: two shuffle-keyed equi-joins worth of work on (key, band) — the
  * band inflates the left side 2×, nothing else. Skewed bands are ordinary
  * join skew (AQE handles them).
  */
object RangeJoin {

  /** Interval × interval overlap join — every (left, right) pair whose
    * closed integer-second intervals intersect (`l.s <= r.e && r.s <= l.e`),
    * emitted EXACTLY once. The naive form is an inequality join (nested
    * loop in Catalyst; DuckDB plans it as an IEJoin — the oracle
    * cross-check). Here each interval registers in every `bandSec`-wide
    * band it touches, candidates meet in an equi-join on the band, and a
    * pair is kept only in its RESPONSIBILITY band — the band containing
    * `greatest(l.s, r.s)`, i.e. where the overlap starts — so no distinct
    * pass is needed to dedup multi-band pairs.
    *
    * Scale: the explode factor is interval-length / bandSec + 1 (bounded
    * for bounded intervals — pick bandSec near the typical length);
    * everything else is one hash equi-join on the band. Degenerate bands
    * (everyone online at the same hour) are ordinary join skew — AQE
    * splits them. `extraCond` prunes inside the join (e.g. `$"ua" < $"ub"`
    * for self-joins).
    *
    * Both inputs must already expose integer-second columns; all four
    * column names must be distinct across the two sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      sL: String, eL: String, sR: String, eR: String,
                      bandSec: Long, extraCond: Column): DataFrame = {
    require(bandSec > 0, "bandSec must be positive")
    // Exact long floor-division — double `divide` + cast truncation is
    // silently imprecise once magnitudes approach 2^53 (nanosecond
    // timestamps). `x - pmod(x, b)` is the largest multiple of b <= x
    // (pmod is non-negative), so the integral divide is exact and the
    // truncate-vs-floor distinction vanishes.
    def bandOf(c: Column) = {
      val x = c.cast("long")
      call_function("div", x - pmod(x, lit(bandSec)), lit(bandSec))
    }
    // An inverted interval (end < start) would make sequence() emit a
    // DESCENDING band list — bands that exist nowhere else — and the pair
    // would silently never match. Fail loudly instead.
    def bandsOf(s: Column, e: Column) =
      when(s <= e, sequence(bandOf(s), bandOf(e)))
        .otherwise(raise_error(concat(
          lit("intervalOverlap: invalid interval, end < start: "),
          s.cast("string"), lit(" > "), e.cast("string"))))
    val l = left.withColumn("__band", explode(bandsOf(col(sL), col(eL))))
    val r = right.withColumn("__bandR", explode(bandsOf(col(sR), col(eR))))
    l.join(r,
        col("__band") === col("__bandR") && extraCond &&
          col(sL) <= col(eR) && col(sR) <= col(eL) &&
          bandOf(greatest(col(sL), col(sR))) === col("__band"))
      .drop("__band", "__bandR")
  }

  /** Pairs (a, b) with `a.idCol < b.idCol`, same `key`, and
    * `0 <= floorEpoch(b.ts) - floorEpoch(a.ts) <= widthSec`. Returns the
    * a/b id pair plus key and the second-difference. */
  def withinInterval(df: DataFrame, key: String, idCol: String, tsCol: String,
                     widthSec: Long): DataFrame = {
    require(widthSec > 0, "widthSec must be positive — width 0 would duplicate the probe band")
    val base = df.select(
      col(key), col(idCol),
      unix_timestamp(col(tsCol).cast("timestamp")).as("__sec"))
      .withColumn("__band", col("__sec") - pmod(col("__sec"), lit(widthSec))) // exact long floor to band start
    val probe = base
      .withColumn("__probe", explode(array(col("__band"), col("__band") + widthSec)))
      .select(col(key), col(idCol).as("a"), col("__sec").as("__asec"), col("__probe"))
    val build = base.select(col(key), col(idCol).as("b"), col("__sec").as("__bsec"),
      col("__band").as("__probe"))
    probe.join(build, Seq(key, "__probe"))
      .filter(col("a") < col("b") &&
        col("__bsec") - col("__asec") >= 0 && col("__bsec") - col("__asec") <= widthSec)
      .select(col(key), col("a"), col("b"), (col("__bsec") - col("__asec")).as("gap_sec"))
  }
}
