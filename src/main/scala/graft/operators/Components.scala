package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation PLUS pointer jumping — the
  * step that turns near-dup PAIRS into dedup GROUPS (keep one canonical doc
  * per component).
  *
  * Each node starts labeled with its own id; every iteration each node
  * first takes the min of its label and its neighbors' labels (propagation,
  * +1 hop of reach), then jumps through the label map once more
  * (`L(u) := min(L(u), L_prev(L(u)))` — Shiloach–Vishkin-style shortcut,
  * which roughly DOUBLES the reach per round). At fixpoint every node
  * carries the min id of its component (deterministic canonical
  * representative).
  *
  * Why the jump preserves correctness: the invariant is that `L(u)` is
  * always the id of a node in u's component with `L(u) <= u` — true at
  * init, preserved by neighbor mins (neighbors share the component) and by
  * jumps (`L_prev(L(u))` is in `L(u)`'s = u's component). A state that is
  * a fixpoint of the NEIGHBOR step alone is already fully labeled: if some
  * edge (u,w) had `L(u) = m < L(w)`, w would still change — so the
  * exhaustion check below needs only the propagation condition.
  *
  * Scale: per iteration, the neighbor join + aggregate, a distinct-label
  * shortcut build, and the (AQE-broadcastable, skew-free) jump join — all
  * keyed shuffles; iterations needed = O(log diameter) — a 400-hop chain
  * labels in ~10 rounds where pure propagation needs 400 (ScaleSpec-proven).
  * `localCheckpoint` per iteration truncates the self-referential lineage,
  * the same hazard mergeIncremental documents.
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
      // each node pulls the min label among its neighbors, then shortcuts
      // once through the previous label map (pointer jump); the convergence
      // flag rides along in the same projection, so the count of changed
      // rows is a cheap scan of the checkpointed result — one materializing
      // job per iteration instead of a second label-vs-label join.
      val neighborMin = sym
        .join(labels.withColumnRenamed(idCol, "dst"), Seq("dst"))
        .groupBy(col("src").as(idCol))
        .agg(min(col("component")).as("nmin"))
      // jump map, built from the ALREADY-CHECKPOINTED previous labels (not
      // this round's l1, which would need its own materialization to be
      // safe to reference twice): for each DISTINCT current label value v,
      // the shortcut v -> L_prev(v). Keying the row join on the label value
      // directly would concentrate a whole component onto one shuffle key
      // as labels converge (hot-key skew); the distinct() collapses the
      // duplicates in map-side partial aggregation first, and the shortcut
      // frame SHRINKS toward #components as convergence proceeds, so AQE
      // flips the row join to a broadcast — no big-side shuffle at exactly
      // the iterations where the skew would bite. Jumping through the
      // stale map still doubles reach per round.
      val shortcut = labels.select(col("component").as("__jid")).distinct()
        .join(labels.select(col(idCol).as("__jnode"), col("component").as("__jcomp")),
          col("__jid") === col("__jnode"))
        .select(col("__jid"), col("__jcomp"))
      val updated = labels.join(neighborMin, Seq(idCol), "left")
        .select(col(idCol), col("component").as("__prev"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("l1"))
        .join(shortcut, col("l1") === col("__jid"), "left")
        .select(col(idCol),
          least(col("l1"), coalesce(col("__jcomp"), col("l1"))).as("component"),
          col("__prev"))
        .select(col(idCol), col("component"),
          (col("component") < col("__prev")).cast("long").as("__chg"))
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
            s"($wouldChange labels still changing) — raise maxIter " +
            s"(pointer jumping needs ~log2(diameter) iterations)")
    }
    labels
  }
}
