package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scale-technique proofs: salted aggregation equivalence, bucketed
  * co-located joins (shuffle-free), approximate-aggregate accuracy. These
  * assert the 100 TB design claims in PLANS.md on real plans. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("salted aggregation == plain aggregation (skew-safe groupBy)") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy($"user_id")
      .agg(round(sum($"value"), 6).as("sum_value"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(ev, "user_id", "value", "event_id", salts = 8)
      .select($"user_id", round($"sum_value", 6).as("sum_value"), $"n")
    assert(plain.except(salted).count() == 0 && salted.except(plain).count() == 0)
  }

  test("bucketed tables co-locate: join on bucket key plans without shuffle") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bkt")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("approximate aggregates land within tolerance of exact") {
    val exact = Tables.lineitem(spark, sfDir)
      .agg(countDistinct($"l_partkey").cast("double").as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(Double, Double)].head()
    val approx = Tables.lineitem(spark, sfDir)
      .agg(approx_count_distinct($"l_partkey").cast("double").as("d"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("m"))
      .as[(Double, Double)].head()
    assert(math.abs(approx._1 - exact._1) / exact._1 < 0.05)
    assert(math.abs(approx._2 - exact._2) / exact._2 < 0.05)
  }
}
