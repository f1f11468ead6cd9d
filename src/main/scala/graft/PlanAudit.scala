package graft

import org.apache.spark.sql.DataFrame

/** Reusable executed-plan assertions for the scale guardrails whose failure
  * mode is a SILENT no-op rather than an error (r10 verdict "Next round
  * #8"). AQE decisions exist only in the finalized plan, so each assertion
  * drives the dataset's OWN QueryExecution — `count()`/`rdd`/`collect()` on
  * the DataFrame each wrap a NEW QueryExecution and would leave this one's
  * AdaptiveSparkPlan un-finalized. Execution happens on the executors
  * (`RDD.foreach` consumes each partition's iterator in place); nothing is
  * shipped to the driver. */
object PlanAudit {

  /** Execute `df` to finalization and return the final plan string. */
  def finalizedPlan(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    plan.execute().foreach(_ => ())
    plan.toString
  }

  /** Assert AQE's OptimizeSkewedJoin actually split the skewed partition
    * (`skew=true` in the finalized sort-merge join). x146 found TWO
    * preconditions under which the optimization silently no-ops with the
    * result still correct but the hot partition unsplit — exactly the
    * failure that melts a 100 TB fact-fact join — so any query that
    * RELIES on AQE skew handling should pin it with this assertion:
    *
    *  1. each Sort child must be a bare shuffle stage — an inline
    *     `distinct()`/aggregate under the Sort breaks the
    *     SMJ(Sort(stage), Sort(stage)) pattern match;
    *  2. the skewed side needs >1 map task — the split regroups MAP
    *     outputs, so a single input split leaves nothing to regroup
    *     (and thresholds compare against COMPRESSED shuffle bytes).
    *
    * Returns the plan string for further assertions. */
  def assertSkewHandled(df: DataFrame, requireSortMergeJoin: Boolean = true): String = {
    val s = finalizedPlan(df)
    if (requireSortMergeJoin)
      require(s.contains("SortMergeJoin"),
        s"skew audit: join degraded from SortMergeJoin (broadcast at this SF?):\n$s")
    require(s.contains("skew=true"),
      "skew audit: OptimizeSkewedJoin did NOT fire. Known silent no-op " +
        "preconditions: (1) a Sort child that is not a bare shuffle stage " +
        "(inline distinct()/agg under the Sort breaks the pattern); " +
        "(2) a single-map-task skewed side (split regroups map outputs; " +
        s"thresholds are COMPRESSED bytes). Final plan:\n$s")
    s
  }
}
