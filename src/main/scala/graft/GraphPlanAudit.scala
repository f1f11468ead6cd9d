package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: plan (never execute) ONE iteration of each fixpoint graph
  * operator so the per-round join shape is `.explain`-inspectable.
  *
  * The production loops (pageRank/kCore/bfsHops in [[graft.operators.Graph]],
  * label alternation in Components) run eager `localCheckpoint` jobs at
  * DataFrame-construction time, so `ExplainAudit` deliberately excludes the
  * graph queries — explaining them would EXECUTE the heaviest pipelines in
  * the repo. This tool instead feeds the extracted per-iteration step
  * functions (`pageRankStep`/`kCoreStep`/`bfsStep` — the very code the
  * loops call) with sf0.001-parquet-backed stand-in frames of the same
  * schemas, and prints the formatted plan WITHOUT any action. Leaf nodes
  * differ from production (parquet scans here vs checkpointed LogicalRDDs
  * in the loop), but everything above the leaves — the join strategies,
  * aggregation placement, and exchange keys being audited — is the
  * operator's own step code. */
object GraphPlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import graft.operators.Graph

    // stand-ins with the loop frames' schemas, parquet-backed, never executed
    val nd = Tables.nation(spark, dir).select(col("n_nationkey").cast("long").as("node"))
    val edges = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("src"),
        (col("s_suppkey") % 25).cast("long").as("dst"), lit(1L).as("w"))
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    val e = edges.join(outw, "src")
    val ranks = nd.select(col("node"), lit(Graph.MassFp / 25).as("rank_fp"))

    println("\n===== pageRank: one iteration (edge ⋈ ranks → per-dst agg → node left join) =====")
    Graph.pageRankStep(nd, e, ranks, lit(0L)).explain("formatted")

    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    println("\n===== kCore: one peeling round (degree agg → keep set → two semi-joins) =====")
    Graph.kCoreStep(sym, 3).explain("formatted")

    val visited = nd.withColumn("hop", lit(0))
    val frontier = nd.select(col("node"))
    println("\n===== bfsHops: one frontier expansion (frontier ⋈ edges → distinct → anti-join) =====")
    Graph.bfsStep(frontier, edges.select(col("src"), col("dst")), visited)
      .explain("formatted")

    val dist = nd.withColumn("d", lit(0L))
    println("\n===== sssp: one Bellman-Ford relaxation (dist ⋈ edges → union → per-node min) =====")
    Graph.ssspStep(dist, edges).explain("formatted")

    println("\n===== components stars: convergence probe (one census aggregation — r16 fusion of semi-join count + groupBy count) =====")
    graft.operators.Components.starCensusPending(edges.select(col("src"), col("dst")))
      .explain("formatted")

    val eDec = edges.select(col("src"), col("dst"),
      col("w").cast("decimal(38,0)").as("w"))
    val hubs = nd.select(col("node"), lit(1).cast("decimal(38,0)").as("hub"))
    println("\n===== hits: one half-sweep (scores ⋈ edges on src → per-dst agg → node left join) =====")
    Graph.hitsHalfStep(nd, eDec, hubs, fromCol = "src", toCol = "dst",
      inName = "hub", outName = "auth").explain("formatted")
    spark.stop()
  }
}
