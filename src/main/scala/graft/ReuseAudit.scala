package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: execute queries and report RUNTIME exchange reuse. Static
  * `explain` can NOT show this under AQE — ReuseExchange is applied by the
  * adaptive stage cache during execution, so the initial plan prints every
  * duplicate subtree even when runtime will execute it once. The final
  * adaptive plan's ReusedQueryStage nodes are the ground truth.
  *
  * Usage: `runMain graft.ReuseAudit <query names...>` (defaults to the
  * multi-round retrieval queries + capstone v3, the plans with deliberate
  * shared subtrees). */
object ReuseAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("x80_bm25_topk", "x84_prf_expansion", "x81_rrf_fusion",
        "x93_training_corpus_v3",
        // x16's repartition(doc_id) reuse point: the four winnow_fps
        // consumers must resolve to ONE materialized stage (r8, 5.4→1.9 s)
        "x16_bloom_decontaminate",
        // x87's judged frame is the same qterms⋈tf join bm25Ranked runs
        "x87_ndcg_eval",
        // x115: reused=0 is CORRECT here — the q_id%100 filter pushes
        // below the query side's tf aggregate into its scan, so that
        // side re-explodes 1% of docs instead of sharing (and thereby
        // paying for) the full unfiltered tf stage. Contrast x80, whose
        // unfiltered dl side does share tf's exchange (reused=1).
        "x115_sparse_topk")
    names.foreach { n =>
      val df = Registry.byName(n).fn(spark, dir)
      // collect() executes df's OWN QueryExecution (a write would plan a
      // fresh one and leave this AdaptiveSparkPlan un-finalized); audited
      // results are top-k lists / aggregates, small by construction.
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).size
      val shuffles = "ShuffleQueryStage".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      println(s"[reuse] $n reused=$reused shuffleStages=$shuffles scans=$scans")
    }
    spark.stop()
  }
}
