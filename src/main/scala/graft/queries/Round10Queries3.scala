package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Skew
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil.halfUp4

/** Round-10 third tier: the remaining scale mechanics that had operators or
  * specs but no driver-visible oracle pair (salted aggregation, dynamic
  * partition pruning), plus three new capabilities a 100 TB lakehouse /
  * training-corpus platform needs — KMV-sketch join discovery over column
  * key-sets, per-domain frequency caps for corpus balancing, and the
  * change-data-feed APPLY that proves a snapshot diff is a lossless delta. */
object Round10Queries3 {

  // ---------------------------------------------------------------- x140

  /** Salt fan-out for x140 — enough splits that the hot key's partials
    * spread across the 32 local cores; a 1000-executor deployment would
    * size this to a small multiple of the reducer count. */
  private val SaltBuckets = 16

  /** x140: hot-key salted aggregation parity — the driver-visible oracle
    * pair for `Skew.saltedSumCount` (spec-only in ScaleSpec until now).
    * ~70% of events are collapsed onto one degenerate group key (the
    * one-user-with-10⁹-events shape), then aggregated as
    * partial-on-(key,salt) → final-on-key. The oracle recomputes the
    * plain single-stage GROUP BY: for the exact integer aggregates
    * (cents sum, count) the two-stage rewrite must be result-identical —
    * that identity is exactly what the hash match certifies.
    *
    * Scale: AQE rebalances skewed JOINS but not skewed aggregations; the
    * salt splits the hot key across `SaltBuckets` partial groups so no
    * single reducer owns 70% of the data. Both shuffles move only
    * (key, salt) partial rows — O(keys × salts), not O(rows). Cents are
    * summed as BIGINT so the rewrite is exact (double sums would only
    * reassociate). */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(
      when($"user_id" % 10 < 7, lit(-1L)).otherwise($"user_id").as("grp"),
      floor($"value" * 100 + 0.5).cast("long").as("cents"),
      $"event_id")
    Skew.saltedSumCount(ev, "grp", "cents", "event_id", salts = SaltBuckets)
      .orderBy("grp")
  }

  private val saltedAggOracle =
    """SELECT CASE WHEN user_id % 10 < 7 THEN -1 ELSE user_id END AS grp,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------- x141

  /** KMV sketch size. k=256 ⇒ RSE ≈ 1/√(k−2) ≈ 6.3%; the emitted bound
    * checks 15% (~2.4σ). */
  private val KmvK = 256

  /** (k−1)·2⁴⁸ — the KMV estimator numerator over 48-bit hash space;
    * integer arithmetic end to end so both engines derive bit-identical
    * estimates (no float division). */
  private val KmvM: Long = (KmvK - 1).toLong << 48

  /** 48-bit hash of a key value: first 12 hex nibbles of md5 of the
    * decimal rendering — deterministic and implementable identically in
    * DuckDB (strpos nibble parse), so the SKETCH itself is oracle-exact. */
  private def kmvHash(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 12), 16, 10).cast("long")

  /** x141: KMV-sketch join discovery — the data-lake "which columns join?"
    * primitive (inclusion-dependency / FK-candidate detection à la
    * Aurum/Lazo): per-column k-minimum-values sketches over md5-hashed key
    * sets give mergeable NDV, union-NDV, and containment ESTIMATES that
    * are pure integer functions of the deterministic sketch — so unlike
    * HLL (q96), the oracle reproduces every estimate bit-for-bit, and the
    * exact NDV/containment computed next to them grade the estimator
    * in-result (`ndv_ok`, `cont_ok` at a 15% ≈ 2.4σ bound).
    *
    * Four column pairs stage the realistic outcomes: a true FK
    * (lineitem.partkey ⊆ part), a reverse-range false candidate
    * (part.partkey ⊇ supplier.suppkey — containment 0.05), a numeric-
    * coincidence false FK (events.user_id ⊆ customer.c_custkey only
    * because both are small dense integer ranges — exactly the candidate
    * a discovery tool must surface for human review), and a dense
    * bidirectional key (customer ↔ orders).
    *
    * Scale: each sketch is one scan + a k-row TakeOrdered per column —
    * O(k) state per column regardless of cardinality, mergeable by
    * union-then-truncate, so a catalog maintains sketches per
    * column-partition incrementally and join discovery across ALL column
    * pairs becomes k-row sketch intersections, never data joins. The
    * exact columns here are the audit, not the production path. */
  def kmvInclusion(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(
      ("p1_lineitem_part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      ("p2_part_supplier", Tables.part(spark, dir), "p_partkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      ("p3_events_customer", Tables.events(spark, dir), "user_id",
        Tables.customer(spark, dir), "c_custkey"),
      ("p4_customer_orders", Tables.customer(spark, dir), "c_custkey",
        Tables.orders(spark, dir), "o_custkey"))
    pairs.map { case (label, dfA, colA, dfB, colB) =>
      kmvPair(spark, label, dfA, colA, dfB, colB)
    }.reduce(_ unionByName _).orderBy("pair")
  }

  private def kmvPair(spark: SparkSession, label: String,
      dfA: DataFrame, colA: String, dfB: DataFrame, colB: String): DataFrame = {
    import spark.implicits._
    def vals(df: DataFrame, c: String) = df.select(col(c).cast("long").as("v")).distinct()
    def sketch(v: DataFrame) =
      v.select(kmvHash($"v").as("h")).distinct().orderBy("h").limit(KmvK)
    val va = vals(dfA, colA); val vb = vals(dfB, colB)
    val sa = sketch(va); val sb = sketch(vb)
    val su = sa.union(sb).distinct().orderBy("h").limit(KmvK)
    val row = va.agg(count(lit(1)).as("ndv_a"))
      .crossJoin(vb.agg(count(lit(1)).as("ndv_b")))
      .crossJoin(va.join(vb, "v").agg(count(lit(1)).as("n_ab")))
      .crossJoin(sa.agg(max($"h").as("hk_a"), count(lit(1)).as("nk_a")))
      .crossJoin(sb.agg(max($"h").as("hk_b"), count(lit(1)).as("nk_b")))
      .crossJoin(su.agg(max($"h").as("hk_u"), count(lit(1)).as("nk_u")))
      .crossJoin(su.join(sa, "h").join(sb, "h").agg(count(lit(1)).as("n_both")))
    def est(nk: String, hk: String) =
      expr(s"CASE WHEN $nk < $KmvK THEN $nk ELSE CAST($KmvM AS BIGINT) DIV $hk END")
    row.select(lit(label).as("pair"), $"ndv_a", $"ndv_b", $"n_ab",
        est("nk_a", "hk_a").as("est_a"), est("nk_b", "hk_b").as("est_b"),
        est("nk_u", "hk_u").as("est_u"), $"n_both", $"nk_u")
      .withColumn("est_ab", expr("n_both * est_u DIV nk_u"))
      .select($"pair", $"ndv_a", $"ndv_b", $"n_ab",
        $"est_a", $"est_b", $"est_u", $"est_ab",
        halfUp4($"n_ab".cast("double") / $"ndv_a".cast("double")).as("cont_exact"),
        halfUp4($"est_ab".cast("double") / $"est_a".cast("double")).as("cont_est"))
      .withColumn("ndv_ok",
        ((abs($"est_a".cast("double") - $"ndv_a".cast("double")) <=
            $"ndv_a".cast("double") * 0.15) &&
          (abs($"est_b".cast("double") - $"ndv_b".cast("double")) <=
            $"ndv_b".cast("double") * 0.15)).cast("int"))
      .withColumn("cont_ok", (abs($"cont_est" - $"cont_exact") <= 0.15).cast("int"))
  }

  /** DuckDB 48-bit nibble parse of an md5 column `m` (the repo's standard
    * strpos pattern, Horner form). */
  private def h48Sql(m: String): String =
    (1 to 12).foldLeft("CAST(0 AS BIGINT)")((acc, i) =>
      s"($acc * 16 + (strpos('0123456789abcdef', substr($m, $i, 1)) - 1))")

  private def kmvPairSql(p: String, label: String,
      tblA: String, colA: String, tblB: String, colB: String): (String, String) = {
    val ctes =
      s"""${p}va AS (SELECT DISTINCT CAST($colA AS BIGINT) AS v FROM $tblA),
         |${p}vb AS (SELECT DISTINCT CAST($colB AS BIGINT) AS v FROM $tblB),
         |${p}ha AS (SELECT DISTINCT ${h48Sql("m")} AS h
         |           FROM (SELECT md5(CAST(v AS VARCHAR)) AS m FROM ${p}va)),
         |${p}hb AS (SELECT DISTINCT ${h48Sql("m")} AS h
         |           FROM (SELECT md5(CAST(v AS VARCHAR)) AS m FROM ${p}vb)),
         |${p}sa AS (SELECT h FROM ${p}ha ORDER BY h LIMIT $KmvK),
         |${p}sb AS (SELECT h FROM ${p}hb ORDER BY h LIMIT $KmvK),
         |${p}su AS (SELECT h FROM (SELECT h FROM ${p}sa UNION SELECT h FROM ${p}sb)
         |           ORDER BY h LIMIT $KmvK),
         |${p}row AS (SELECT
         |  (SELECT count(*) FROM ${p}va) AS ndv_a,
         |  (SELECT count(*) FROM ${p}vb) AS ndv_b,
         |  (SELECT count(*) FROM ${p}va a JOIN ${p}vb b ON a.v = b.v) AS n_ab,
         |  (SELECT max(h) FROM ${p}sa) AS hk_a, (SELECT count(*) FROM ${p}sa) AS nk_a,
         |  (SELECT max(h) FROM ${p}sb) AS hk_b, (SELECT count(*) FROM ${p}sb) AS nk_b,
         |  (SELECT max(h) FROM ${p}su) AS hk_u, (SELECT count(*) FROM ${p}su) AS nk_u,
         |  (SELECT count(*) FROM ${p}su u
         |     JOIN ${p}sa a ON u.h = a.h JOIN ${p}sb b ON u.h = b.h) AS n_both)""".stripMargin
    def est(nk: String, hk: String) =
      s"CASE WHEN $nk < $KmvK THEN $nk ELSE CAST($KmvM AS BIGINT) // $hk END"
    val select =
      s"""SELECT '$label' AS pair,
         |  CAST(ndv_a AS BIGINT) AS ndv_a, CAST(ndv_b AS BIGINT) AS ndv_b,
         |  CAST(n_ab AS BIGINT) AS n_ab, est_a, est_b, est_u, est_ab,
         |  floor(CAST(n_ab AS DOUBLE) / CAST(ndv_a AS DOUBLE) * 10000 + 0.5) / 10000.0 AS cont_exact,
         |  floor(CAST(est_ab AS DOUBLE) / CAST(est_a AS DOUBLE) * 10000 + 0.5) / 10000.0 AS cont_est,
         |  CAST(abs(CAST(est_a AS DOUBLE) - CAST(ndv_a AS DOUBLE)) <= CAST(ndv_a AS DOUBLE) * 0.15
         |       AND abs(CAST(est_b AS DOUBLE) - CAST(ndv_b AS DOUBLE)) <= CAST(ndv_b AS DOUBLE) * 0.15
         |       AS INTEGER) AS ndv_ok,
         |  CAST(abs((floor(CAST(est_ab AS DOUBLE) / CAST(est_a AS DOUBLE) * 10000 + 0.5) / 10000.0) -
         |           (floor(CAST(n_ab AS DOUBLE) / CAST(ndv_a AS DOUBLE) * 10000 + 0.5) / 10000.0))
         |       <= 0.15 AS INTEGER) AS cont_ok
         |FROM (SELECT *, CAST(n_both * est_u AS BIGINT) // nk_u AS est_ab
         |      FROM (SELECT *, ${est("nk_a", "hk_a")} AS est_a, ${est("nk_b", "hk_b")} AS est_b,
         |                      ${est("nk_u", "hk_u")} AS est_u
         |            FROM ${p}row))""".stripMargin
    (ctes, select)
  }

  private lazy val kmvInclusionOracle: String = {
    val parts = Seq(
      kmvPairSql("k1", "p1_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      kmvPairSql("k2", "p2_part_supplier", "part", "p_partkey", "supplier", "s_suppkey"),
      kmvPairSql("k3", "p3_events_customer", "events", "user_id", "customer", "c_custkey"),
      kmvPairSql("k4", "p4_customer_orders", "customer", "c_custkey", "orders", "o_custkey"))
    s"""WITH ${parts.map(_._1).mkString(",\n")}
       |${parts.map(_._2).mkString("\nUNION ALL\n")}
       |ORDER BY pair""".stripMargin
  }

  // ---------------------------------------------------------------- x142

  /** Per-(source, lang) keep budget — bites on the large en groups of the
    * fixture while sparing small ones, so both branches are exercised. */
  private val DomainCap = 8

  /** x142: per-domain frequency cap — RefinedWeb/C4-style corpus
    * balancing: within each (source, lang) stratum keep at most
    * `DomainCap` documents, selected by a deterministic md5 hash order
    * (an unbiased "random" sample that is stable across engines, runs,
    * and partitionings — no rand()). Emits kept/dropped counts, whether
    * the cap bit, and an md5 digest of the exact survivor id set so the
    * oracle certifies the SELECTION, not just its size.
    *
    * Scale: one row_number window per stratum — a single shuffle on the
    * stratum key; the hot-domain skew this guards against (one domain =
    * 10% of a crawl) is bounded by the cap itself downstream, and the
    * window's sort is per-stratum, not global. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"lang")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source", $"lang").orderBy(md5($"doc_id".cast("string")))))
    ranked.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(($"rk" <= DomainCap).cast("long")).as("n_kept"),
        sum(($"rk" > DomainCap).cast("long")).as("n_dropped"),
        (max($"rk") > DomainCap).cast("int").as("cap_hit"),
        md5(array_join(transform(
          sort_array(collect_list(when($"rk" <= DomainCap, $"doc_id"))),
          x => x.cast("string")), ",")).as("kept_md5"))
      .orderBy("source", "lang")
  }

  private val domainCapOracle =
    s"""WITH r AS (SELECT doc_id, source, lang,
       |  row_number() OVER (PARTITION BY source, lang
       |                     ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
       |  FROM documents)
       |SELECT source, lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN rk <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN rk > $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(max(rk) > $DomainCap AS INTEGER) AS cap_hit,
       |       md5(string_agg(CASE WHEN rk <= $DomainCap THEN CAST(doc_id AS VARCHAR) END,
       |                      ',' ORDER BY doc_id)) AS kept_md5
       |FROM r
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- x143

  /** x143: dynamic partition pruning — the runtime counterpart of x139's
    * static pruning and THE join optimization for partitioned fact tables:
    * the fact side is written once partitioned by year, the dim side is a
    * separately-stored calendar table; a selective dim filter
    * (`in_season = 1`, 3 of the 7 fixture years 1995–2001) reaches the FACT SCAN as a
    * `dynamicpruning` subquery on the partition column (plan-asserted in
    * OperatorsSpec), so only the 3 matching directories are read even
    * though the year set is unknowable at plan time. The oracle verifies
    * the joined aggregate itself.
    *
    * Scale: at 100 TB the fact table is date-partitioned into thousands of
    * directories; DPP reuses the dim side's broadcast to skip all
    * non-qualifying partitions at the SOURCE — I/O proportional to the
    * dim selectivity, not the table. Without it, every fact partition is
    * scanned and the filter applies post-join. */
  def dynPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x143").toString
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
        year($"o_orderdate".cast("date")).as("o_year"))
      .write.partitionBy("o_year").parquet(s"$base/orders")
    spark.range(1995, 2002)
      .select($"id".cast("int").as("d_year"), ($"id" % 3 === 0).cast("int").as("in_season"))
      .write.parquet(s"$base/dim")
    // eager localCheckpoint so the staged fact/dim copies can be deleted
    // before returning (plan assertion lives in OperatorsSpec via
    // dynPartitionPruneOn over its own staging dir)
    val out = dynPartitionPruneOn(spark, base).localCheckpoint()
    QueryUtil.deleteRecursively(base)
    out.orderBy("o_orderpriority")
  }

  /** The pruned-join query alone, over already-written fact/dim dirs —
    * split out so the spec can assert the dynamicpruning plan shape. */
  private[graft] def dynPartitionPruneOn(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val fact = spark.read.parquet(s"$base/orders")
    val dim = spark.read.parquet(s"$base/dim").filter(col("in_season") === 1)
    fact.join(dim, fact("o_year") === dim("d_year"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("cents"))
      .orderBy("o_orderpriority")
  }

  private val dynPartitionPruneOracle =
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |WHERE year(CAST(o_orderdate AS DATE)) % 3 = 0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- x144

  /** Mod-prime for the commutative row digest: each term < 2³¹, so a
    * per-source sum stays exact in BIGINT up to ~4×10⁹ rows per source —
    * beyond that a deployment takes the outer sum mod p too. */
  private val DigestP = 2147483647L

  /** x144: change-data-feed APPLY — closes the loop x130 opened: the
    * row-level diff (added/removed/changed) between snapshot A and the
    * deterministically-derived snapshot B is APPLIED back to A
    * (anti-join out the touched keys, union in the new payloads), and the
    * reconstruction B′ is compared to B per source by row count and an
    * ORDER-FREE commutative digest (sum of 48-bit md5 of doc_id:hash,
    * mod-prime) — proving the diff is a lossless delta: ship the diff,
    * not the snapshot.
    *
    * Scale: diff is one full-outer equi-join on the key; apply is one
    * anti-join + union; the digest is a map-side-combinable sum with
    * O(1) state per source — every stage is a keyed shuffle, and the
    * commutative digest (vs an order-dependent string_agg) is what makes
    * snapshot comparison feasible without a global sort at 100 TB. */
  def diffApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val a = docs.select($"doc_id", $"source", md5($"text").as("h"))
    // snapshot B: same derivation as x130 (every 17th removed, every 13th
    // edited, every 29th cloned into the negative keyspace)
    val b = docs.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", $"source",
        md5(when($"doc_id" % 13 === 0, concat($"text", lit(" v2")))
          .otherwise($"text")).as("h"))
      .unionByName(docs.filter($"doc_id" % 29 === 0)
        .select((-($"doc_id" + 1L)).as("doc_id"), $"source", md5($"text").as("h")))
    val diff = a.select($"doc_id", $"source".as("src_a"), $"h".as("ha"))
      .join(b.select($"doc_id", $"source".as("src_b"), $"h".as("hb")),
        Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"ha".isNull, "added").when($"hb".isNull, "removed")
          .when($"ha" =!= $"hb", "changed").otherwise("unchanged").as("status"),
        coalesce($"src_b", $"src_a").as("source"), $"hb")
      .filter($"status" =!= "unchanged")
    val kept = a.join(diff.select($"doc_id"), Seq("doc_id"), "left_anti")
    val bPrime = kept.unionByName(
      diff.filter($"status".isin("added", "changed"))
        .select($"doc_id", $"source", $"hb".as("h")))
    def digest(df: DataFrame, nName: String, dgName: String) =
      df.groupBy($"source").agg(
        count(lit(1)).as(nName),
        sum(conv(substring(md5(concat($"doc_id".cast("string"), lit(":"), $"h")), 1, 12), 16, 10)
          .cast("long") % DigestP).as(dgName))
    digest(b, "n_b", "dg_b")
      .join(digest(bPrime, "n_bprime", "dg_bprime"), "source")
      .select($"source", $"n_b", $"n_bprime", $"dg_b", $"dg_bprime",
        ($"n_b" === $"n_bprime" && $"dg_b" === $"dg_bprime").cast("int").as("ok"))
      .orderBy("source")
  }

  private lazy val diffApplyOracle = {
    val dg = s"(${h48Sql("md5(CAST(doc_id AS VARCHAR) || ':' || h)")}) % $DigestP"
    s"""WITH a AS (SELECT doc_id, source, md5(text) AS h FROM documents),
       |b AS (SELECT doc_id, source,
       |             md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS h
       |      FROM documents WHERE doc_id % 17 <> 0
       |      UNION ALL
       |      SELECT -(doc_id + 1) AS doc_id, source, md5(text) AS h
       |      FROM documents WHERE doc_id % 29 = 0),
       |d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |        CASE WHEN a.h IS NULL THEN 'added'
       |             WHEN b.h IS NULL THEN 'removed'
       |             WHEN a.h <> b.h THEN 'changed'
       |             ELSE 'unchanged' END AS status,
       |        coalesce(b.source, a.source) AS source, b.h AS hb
       |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
       |diff AS (SELECT * FROM d WHERE status <> 'unchanged'),
       |kept AS (SELECT a.* FROM a WHERE a.doc_id NOT IN (SELECT doc_id FROM diff)),
       |bprime AS (SELECT doc_id, source, h FROM kept
       |           UNION ALL
       |           SELECT doc_id, source, hb AS h FROM diff
       |           WHERE status IN ('added', 'changed')),
       |db AS (SELECT source, CAST(count(*) AS BIGINT) AS n_b,
       |              CAST(sum($dg) AS BIGINT) AS dg_b
       |       FROM b GROUP BY source),
       |dp AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bprime,
       |              CAST(sum($dg) AS BIGINT) AS dg_bprime
       |       FROM bprime GROUP BY source)
       |SELECT db.source, n_b, n_bprime, dg_b, dg_bprime,
       |       CAST(n_b = n_bprime AND dg_b = dg_bprime AS INTEGER) AS ok
       |FROM db JOIN dp ON db.source = dp.source
       |ORDER BY db.source""".stripMargin
  }

  // ----------------------------------------------------------------

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x140_salted_agg",
      "hot-key salted aggregation parity: (key,salt) partial -> final two-stage rewrite == plain group-by (the skew fix AQE doesn't do for aggs)",
      saltedAgg, Some(saltedAggOracle)),
    QueryDef("x141_kmv_inclusion",
      "KMV-sketch join discovery: deterministic k-min-values NDV/containment estimates over 4 column pairs, graded against exact in-result",
      kmvInclusion, Some(kmvInclusionOracle)),
    QueryDef("x142_domain_cap",
      "per-(source,lang) frequency cap: deterministic hash-ranked keep<=K with survivor-set digest (RefinedWeb-style corpus balancing)",
      domainCap, Some(domainCapOracle)),
    QueryDef("x143_dynamic_prune",
      "dynamic partition pruning: calendar-dim filter prunes the partitioned fact scan at runtime via a dynamicpruning subquery (plan-asserted)",
      dynPartitionPrune, Some(dynPartitionPruneOracle)),
    QueryDef("x144_diff_apply",
      "change-data-feed apply: x130's row diff applied to snapshot A reconstructs B exactly (count + commutative mod-prime digest per source)",
      diffApply, Some(diffApplyOracle)))
}
