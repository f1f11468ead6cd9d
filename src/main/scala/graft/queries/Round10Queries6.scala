package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 sixth tier: the row-level runtime-filter join optimization
  * (the sibling of x143's partition-level DPP) and the l-diversity
  * privacy screen that completes q65's k-anonymity governance pass. */
object Round10Queries6 {

  // ---------------------------------------------------------------- x153

  /** x153: runtime bloom-filter join pruning — the ROW-level sibling of
    * x143's DPP, for join columns that are NOT the partition key: the
    * optimizer's InjectRuntimeFilter plants a bloom filter built from the
    * selective dim side (`p_size > 47`, ~6% of parts) as a
    * `might_contain` bloom predicate on the fact scan, so
    * non-matching lineitem rows die at the source instead of crossing the
    * join shuffle (plan-asserted in OperatorsSpec). The merge hint keeps
    * the demo on SMJ — with a broadcast join the filter is moot; the
    * application-side threshold (default 10 GB — a no-inject guard, not a
    * semantics knob) is lowered inside the forced-execution conf window
    * and restored, like x146. The oracle recomputes the join + rollup.
    *
    * Scale: at 100 TB this is the difference between shuffling the whole
    * fact table and shuffling the ~6% that can possibly match — the same
    * I/O story as DPP but applicable to any equi-join column. False
    * positives only cost spill, never correctness. */
  def runtimeFilter(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "1024")
      // a broadcast-able dim disables injection (isProbablyShuffleJoin is
      // false when the join can plan as BHJ); at fixture scale every dim
      // broadcasts, so the window forces the shuffle-join planning a
      // 100 TB fact-fact join would have naturally
      conf.set(keys(2), "-1")
      // eager localCheckpoint forces execution HERE so the conf window
      // applies — result stays in executor block storage, not the driver
      runtimeFilterPlan(spark, dir).localCheckpoint()
        .orderBy("p_brand")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  private[graft] def runtimeFilterPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"))
    val p = Tables.part(spark, dir).filter($"p_size" > 47)
      .select($"p_partkey", $"p_brand")
    li.hint("merge").join(p.hint("merge"), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
  }

  private val runtimeFilterOracle =
    """SELECT p_brand,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size > 47
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- x154

  /** Distinct-l threshold: a QI group needs >= 3 distinct sensitive
    * values to resist the homogeneity attack. */
  private val DivL = 3

  /** x154: l-diversity screening — the attack q65's k-anonymity does NOT
    * stop: a group can be large (k-anonymous) yet have every member share
    * one sensitive value, so membership alone discloses it. Per
    * quasi-identifier group (q65's nation × segment), the sensitive
    * attribute (account-balance band, floor(acctbal/1000)) is profiled:
    * distinct sensitive values (`l`), the distinct-l flag, and the
    * majority share (`top_share` — 1.0 means fully homogeneous, the
    * disclosure case). A release gate needs BOTH screens green.
    *
    * Scale: one aggregate over (QI, sensitive) then one over QI — two
    * keyed shuffles on frames bounded by |QI| × |bands|, corpus-size-free
    * after the first. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("band"))
      .groupBy($"n_name", $"c_mktsegment", $"band")
      .agg(count(lit(1)).as("bn"))
    bands.groupBy($"n_name", $"c_mktsegment")
      .agg(sum($"bn").as("n"),
        count(lit(1)).as("l"),
        max($"bn").as("top_bn"))
      .select($"n_name", $"c_mktsegment", $"n", $"l",
        ($"l" >= DivL).as("l_diverse"),
        halfUp4($"top_bn".cast("double") / $"n".cast("double")).as("top_share"))
      .orderBy("n_name", "c_mktsegment")
  }

  private val lDiversityOracle =
    s"""WITH b AS (SELECT n_name, c_mktsegment,
       |                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
       |                  CAST(count(*) AS BIGINT) AS bn
       |           FROM customer JOIN nation ON c_nationkey = n_nationkey
       |           GROUP BY 1, 2, 3)
       |SELECT n_name, c_mktsegment,
       |       CAST(sum(bn) AS BIGINT) AS n,
       |       CAST(count(*) AS BIGINT) AS l,
       |       count(*) >= $DivL AS l_diverse,
       |       floor(CAST(max(bn) AS DOUBLE) / CAST(sum(bn) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS top_share
       |FROM b
       |GROUP BY n_name, c_mktsegment
       |ORDER BY n_name, c_mktsegment""".stripMargin

  // ----------------------------------------------------------------

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x153_runtime_filter",
      "runtime bloom-filter join pruning: selective dim side plants a might_contain bloom probe on the fact scan (plan-asserted) == plain join oracle",
      runtimeFilter, Some(runtimeFilterOracle)),
    QueryDef("x154_l_diversity",
      "l-diversity privacy screen over q65's quasi-identifiers: distinct sensitive bands per group + majority share (homogeneity-attack audit)",
      lDiversity, Some(lDiversityOracle)))
}
