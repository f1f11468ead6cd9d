package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step that
  * turns near-dup PAIRS into dedup GROUPS (keep one canonical doc per
  * component).
  *
  * Each node starts labeled with its own id; every iteration each node
  * takes the min of its label and its neighbors' labels; at fixpoint every
  * node carries the min id of its component (deterministic canonical
  * representative).
  *
  * Scale: one join + aggregate per iteration, all keyed shuffles;
  * iterations needed = graph diameter (near-dup clusters are shallow — a
  * handful). `localCheckpoint` per iteration truncates lineage, the same
  * hazard mergeIncremental documents. This is the standard "large-star /
  * small-star"-lite; for billion-edge graphs promote to the full
  * alternating algorithm, same plan primitives.
  */
object Components {

  /** @param nodes  one column `idCol`
    * @param edges  two columns `a`, `b` (undirected, a < b convention fine)
    * @param maxIter iteration budget — a safety rail, NOT a silent
    *                truncation: the loop runs to fixpoint and THROWS if the
    *                budget is exhausted first (labels would be wrong for
    *                components with diameter > maxIter).
    * @return (idCol, component) where component = min id reachable */
  def connectedComponents(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
                          idCol: String, maxIter: Int = 50): DataFrame = {
    // symmetric edge list: neighbor view in both directions. Materialized
    // once — the edge source may be an expensive pipeline (e.g. the LSH
    // candidate join) and every iteration references it again.
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(col(idCol), col(idCol).as("component")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    // `changed` counts labels updated IN the iteration that just ran, so a
    // graph whose fixpoint lands exactly on the last budgeted iteration ends
    // the loop with changed > 0 despite correct labels. Budget exhaustion
    // therefore triggers one extra VERIFICATION pass (would any label still
    // change?) before declaring failure.
    while (changed > 0 && iter < maxIter) {
      // each node pulls the min label among its neighbors; the convergence
      // flag rides along in the same projection, so the count of changed
      // rows is a cheap scan of the checkpointed result — one materializing
      // job per iteration instead of a second label-vs-label join.
      val neighborMin = sym
        .join(labels.withColumnRenamed(idCol, "dst"), Seq("dst"))
        .groupBy(col("src").as(idCol))
        .agg(min(col("component")).as("nmin"))
      val updated = labels.join(neighborMin, Seq(idCol), "left")
        .select(col(idCol),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"),
          (coalesce(col("nmin"), col("component")) < col("component")).cast("long").as("__chg"))
        .localCheckpoint(true)
      changed = updated.agg(coalesce(sum(col("__chg")), lit(0L))).first().getLong(0)
      labels = updated.drop("__chg")
      iter += 1
    }
    if (changed > 0) {
      val wouldChange = sym
        .join(labels.withColumnRenamed(idCol, "dst"), Seq("dst"))
        .groupBy(col("src").as(idCol))
        .agg(min(col("component")).as("nmin"))
        .join(labels, Seq(idCol))
        .filter(col("nmin") < col("component"))
        .count()
      if (wouldChange > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter iterations " +
            s"($wouldChange labels still changing) — raise maxIter or promote to large-star/small-star")
    }
    labels
  }
}
