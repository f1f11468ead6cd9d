package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 twenty-third tier: incremental connected-components
  * maintenance — the continual-ingest counterpart of x14's batch
  * clustering (the way x17 is the continual counterpart of the pairwise
  * dedup gates). */
object Round10Queries23 {

  /** x179: incremental near-dup cluster maintenance — x14's verified pair
    * set is split deterministically into a BASE graph ((a+b) % 3 ≠ 0,
    * the "already ingested" corpus) and a DELTA ((a+b) % 3 = 0, the new
    * batch's pairs); the base is labeled once (the stored labeling), then
    * `Components.mergeDeltaEdges` folds the delta in WITHOUT rescanning
    * base edges — every old component collapses to a star through its
    * label, so the merge's round count tracks the delta, not the corpus
    * diameter. The oracle recomputes components of the FULL pair set by
    * transitive closure, so the hash match proves maintain ≡ recompute —
    * the q51/q100 IVM guarantee, for a GRAPH operator.
    *
    * Scale: per batch the work is |Δ| + |labels| edge rows through the
    * pointer-jumping fixpoint (O(log delta-diameter) rounds); the old
    * edge set — the thing that grows forever — is never touched again. */
  def incrementalComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = DedupQueries.minhashLsh(spark, dir).select($"a", $"b")
      .localCheckpoint(true) // split twice below
    val base = pairs.filter(($"a" + $"b") % 3 =!= 0)
    val delta = pairs.filter(($"a" + $"b") % 3 === 0)
    val nodes = Tables.documents(spark, dir).select($"doc_id")
    val stored = graft.operators.Components
      .connectedComponentsStars(spark, nodes, base, "doc_id")
      .localCheckpoint(true) // the labeling a store would persist
    graft.operators.Components
      .mergeDeltaEdges(spark, stored, delta, "doc_id")._1
      .select($"doc_id", $"component".as("cluster_id"),
        ($"doc_id" === $"component").cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Oracle: full recompute over base ∪ delta — which is exactly x14's
    * pair universe, so this is x14's transitive-closure oracle verbatim;
    * the INCREMENTAL path must land on the identical labeling. */
  private lazy val incrementalComponentsOracle =
    DedupQueries.clustersOracleCtes +
      """
        |SELECT doc_id, cluster_id, is_canonical
        |FROM labeled
        |ORDER BY doc_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x179_incremental_components",
      "incremental near-dup cluster maintenance: stored labels + delta edges == full transitive-closure recompute",
      incrementalComponents, Some(incrementalComponentsOracle)))
}
