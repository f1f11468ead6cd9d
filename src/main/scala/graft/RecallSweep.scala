package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r14 verdict "Next round #7"): measure x363's recall@3 as a
  * function of the exact-rerank depth at a given corpus scale. This sweep
  * quantifies the MITIGATION — how much rerank depth buys back the recall
  * that a fixed-size codebook loses as the corpus grows — so the scale
  * story in PLANS.md carries measured numbers instead of a hypothesis.
  * Since r16 the registered query SHIPS the measured guidance (rerank =
  * max(64, corpus/100), oracle-paired); pass "auto" to sweep that default.
  * Usage: `runMain graft.RecallSweep <sfDir> <rerank|auto>...` */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RecallSweep <sfDir> <rerank>...")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { arg =>
      val rerank = if (arg == "auto") None else Some(arg.toInt)
      val t0 = System.nanoTime()
      val rows = queries.Round14Queries3.pqResidualTopKWith(spark, sfDir, rerank)
        .selectExpr("count(*) AS n", "sum(hit3) AS hits").collect()(0)
      val n = rows.getLong(0); val hits = rows.getLong(1)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[recall] sf=$sfDir rerank=$arg%-5s recall@3=${hits.toDouble / n}%.3f ($hits/$n)  ${dt}%.1f s")
    }
    spark.stop()
  }
}
