package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 twenty-fourth tier: cluster-churn audit — the operational
  * metric a production dedup service watches when folding a batch into
  * its near-dup clustering. */
object Round10Queries24 {

  /** x180: cluster churn under the x179 delta fold — when a new batch's
    * near-dup pairs merge into the stored clustering, operations wants to
    * know the blast radius BEFORE republishing canonical ids: how many
    * documents changed label, how many clusters merged away, and how much
    * canonical-id churn downstream consumers will see. Insert-only edges
    * can only COARSEN the partition (labels move to smaller ids,
    * clusters_before ≥ clusters_after, relabeled docs ≥ cluster merges) —
    * all four counts are exact integers the oracle re-derives from two
    * transitive closures (base-only and full).
    *
    * Scale: two labelings via the audited components pipeline (the
    * stored one is free in production — it is the persisted table), one
    * doc_id join, one global aggregate. */
  def clusterChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = DedupQueries.minhashLsh(spark, dir).select($"a", $"b")
      .localCheckpoint(true)
    val base = pairs.filter(($"a" + $"b") % 3 =!= 0)
    val delta = pairs.filter(($"a" + $"b") % 3 === 0)
    val nodes = Tables.documents(spark, dir).select($"doc_id")
    val stored = graft.operators.Components
      .connectedComponentsStars(spark, nodes, base, "doc_id")
      .select($"doc_id", $"component".as("before"))
      .localCheckpoint(true)
    val merged = graft.operators.Components
      .mergeDeltaEdges(spark, stored.select($"doc_id", $"before".as("component")),
        delta, "doc_id")._1
      .select($"doc_id", $"component".as("after"))
    stored.join(merged, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"before" =!= $"after", 1L).otherwise(0L)).as("n_relabeled"),
        countDistinct($"before").as("clusters_before"),
        countDistinct($"after").as("clusters_after"))
      .select($"n_docs", $"n_relabeled", $"clusters_before", $"clusters_after",
        ($"clusters_before" - $"clusters_after").as("n_cluster_merges"),
        ($"clusters_after" <= $"clusters_before" &&
          $"n_relabeled" >= $"clusters_before" - $"clusters_after")
          .cast("int").as("coarsen_invariants_hold"))
  }

  private lazy val clusterChurnOracle =
    DedupQueries.minhashCtes("WITH RECURSIVE") +
      """, pairs2 AS (SELECT a, b FROM j WHERE jaccard >= 0.5),
        |pb AS (SELECT a, b FROM pairs2 WHERE (a + b) % 3 <> 0),
        |eb AS (SELECT a AS src, b AS dst FROM pb UNION ALL SELECT b, a FROM pb),
        |reachb AS (SELECT doc_id AS id, doc_id AS r FROM documents
        |           UNION
        |           SELECT e.src AS id, reachb.r AS r FROM eb e JOIN reachb ON e.dst = reachb.id),
        |labb AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS bef FROM reachb GROUP BY id),
        |ef AS (SELECT a AS src, b AS dst FROM pairs2 UNION ALL SELECT b, a FROM pairs2),
        |reachf AS (SELECT doc_id AS id, doc_id AS r FROM documents
        |           UNION
        |           SELECT e.src AS id, reachf.r AS r FROM ef e JOIN reachf ON e.dst = reachf.id),
        |labf AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS aft FROM reachf GROUP BY id)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN bef <> aft THEN 1 ELSE 0 END) AS BIGINT) AS n_relabeled,
        |       CAST(count(DISTINCT bef) AS BIGINT) AS clusters_before,
        |       CAST(count(DISTINCT aft) AS BIGINT) AS clusters_after,
        |       CAST(count(DISTINCT bef) - count(DISTINCT aft) AS BIGINT) AS n_cluster_merges,
        |       CAST(count(DISTINCT aft) <= count(DISTINCT bef)
        |            AND sum(CASE WHEN bef <> aft THEN 1 ELSE 0 END)
        |                >= count(DISTINCT bef) - count(DISTINCT aft) AS INTEGER)
        |         AS coarsen_invariants_hold
        |FROM labb JOIN labf USING (doc_id)""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x180_cluster_churn",
      "cluster-churn audit of the x179 delta fold: relabeled docs, cluster merges, coarsening invariants",
      clusterChurn, Some(clusterChurnOracle)))
}
