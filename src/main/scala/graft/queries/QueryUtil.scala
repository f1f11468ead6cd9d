package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric helpers for oracle parity. */
object QueryUtil {
  /** Half-up rounding to 4 places via floor — `round()` differs between
    * Spark (HALF_UP) and DuckDB (half-to-even) exactly on `.xxxx5`
    * boundaries, which rational ratios (jaccard, stopword ratios, weighted
    * scores over clean decimals) DO hit. `floor(x*1e4 + 0.5)/1e4` is
    * identical in both engines given bit-identical inputs. Only for
    * non-negative values. */
  def halfUp4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000.0

  /** Generic half-up (toward +inf) rounding to `digits` places — same
    * floor-based trick as [[halfUp4]]; sign-agnostic and bit-identical
    * across engines as long as both sides use the same formula. */
  def halfUp(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits.toDouble)
    floor(c * p + lit(0.5)) / p
  }

  /** Optimizer fence (graft.functions.OptimizerFence): identity wrapper
    * that stops a subsequent filter-on-alias from re-inlining the wrapped
    * expression into the pushed-down predicate — use around an EXPENSIVE
    * projected value (merge-walk jaccard, pair cosine) that a filter then
    * consumes, so it's evaluated once per row instead of twice. */
  def fence(c: Column): Column = call_function("fence", c)
}
