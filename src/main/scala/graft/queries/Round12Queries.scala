package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 first tier: exact resampling inference (permutation test +
  * Benjamini–Hochberg FDR over exact integer p-values), consistent-hash
  * shard rebalancing (HRW), margin-based bitext mining, and the
  * padding-vs-packing waste audit.
  */
object Round12Queries {

  // ---------------------------------------------------------------- x293

  /** Rows per group for the exact permutation enumeration (first
    * [[PermN]] orders per nation by orderkey; C(12,6) = 924 splits). */
  private val PermN = 12
  private val PermK = 6

  /** Shared per-nation exact permutation p-values: observed statistic is
    * |sum(first 6) − sum(last 6)| of the first 12 orders' total prices
    * (cents); the null enumerates ALL C(12,6) equal-split relabelings.
    * Everything is BIGINT: d = |2·sumA − S| compares exactly, and
    * p = p_num/924 is a ratio of counts — the only resampling scheme
    * that can be oracle-paired bit-for-bit, and the reason x294 can run
    * BH on EXACT rationals. */
  private[queries] def permPvalues(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select($"c_nationkey".as("nationkey"), $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"nationkey").orderBy($"o_orderkey")))
      .filter($"rk" <= PermN)
    val groups = ranked.groupBy($"nationkey")
      .agg(count(lit(1)).as("nrows"),
        expr("transform(sort_array(collect_list(struct(o_orderkey, cents))), x -> x.cents)")
          .as("vals"),
        sum(when($"rk" <= PermK, $"cents").otherwise(0L)).as("sum_a_obs"),
        sum($"cents").as("s"))
      .filter($"nrows" === PermN) // only full groups enumerate
      .withColumn("d_obs", abs($"sum_a_obs" * 2 - $"s"))
    // 2^12 masks; popcount via the same fold both engines run (no reliance
    // on a bit_count builtin parity)
    val masks = spark.range(0L, 1L << PermN).toDF("mask")
      .filter(expr(s"aggregate(sequence(0, ${PermN - 1}), 0L, " +
        s"(acc, i) -> acc + (shiftright(mask, i) & 1)) = $PermK"))
    groups.crossJoin(broadcast(masks))
      .withColumn("sum_a", expr(
        s"aggregate(sequence(0, ${PermN - 1}), 0L, (acc, i) -> " +
          "acc + IF((shiftright(mask, i) & 1) = 1, element_at(vals, i + 1), 0L))"))
      .withColumn("d", abs($"sum_a" * 2 - $"s"))
      .groupBy($"nationkey", $"d_obs")
      .agg(sum(when($"d" >= $"d_obs", 1L).otherwise(0L)).as("p_num"),
        count(lit(1)).as("p_den"))
  }

  /** The identical pipeline as DuckDB CTEs ending in
    * `perm_p(nationkey, d_obs, p_num, p_den)`. */
  private[queries] val permPvaluesCtes =
    s"""ranked AS (
       |  SELECT c_nationkey AS nationkey, o_orderkey,
       |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       |         row_number() OVER (PARTITION BY c_nationkey ORDER BY o_orderkey) AS rk
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |grp AS (
       |  SELECT nationkey,
       |         list(cents ORDER BY o_orderkey) AS vals,
       |         CAST(sum(CASE WHEN rk <= $PermK THEN cents ELSE 0 END) AS BIGINT) AS sum_a_obs,
       |         CAST(sum(cents) AS BIGINT) AS s
       |  FROM ranked WHERE rk <= $PermN
       |  GROUP BY nationkey HAVING count(*) = $PermN),
       |gobs AS (SELECT nationkey, vals, s, abs(sum_a_obs * 2 - s) AS d_obs FROM grp),
       |msk AS (SELECT k AS mask FROM range(0, ${1 << PermN}) t(k)
       |        WHERE list_sum(list_transform(range(0, $PermN),
       |                i -> (k >> i) & 1)) = $PermK),
       |perm AS (
       |  SELECT nationkey, d_obs,
       |         abs(2 * list_sum(list_transform(range(0, $PermN),
       |               i -> CASE WHEN ((mask >> i) & 1) = 1
       |                         THEN vals[i + 1] ELSE 0 END)) - s) AS d
       |  FROM gobs, msk),
       |perm_p AS (
       |  SELECT nationkey, d_obs,
       |         CAST(sum(CASE WHEN d >= d_obs THEN 1 ELSE 0 END) AS BIGINT) AS p_num,
       |         CAST(count(*) AS BIGINT) AS p_den
       |  FROM perm GROUP BY nationkey, d_obs)""".stripMargin

  /** x293: exact two-sample permutation test per nation — the
    * distribution-free significance test whose p-value is a RATIO OF
    * COUNTS, enumerated completely (no RNG, no Monte-Carlo): the only
    * resampling scheme an oracle-paired engine can ship bit-exact.
    * Observed split = first [[PermK]] vs last of the first [[PermN]]
    * orders per nation (by orderkey); statistic |2·sumA − S| in BIGINT
    * cents.
    *
    * Scale: the corpus pass is one ranked top-[[PermN]] per group; the
    * enumeration is groups × C(12,6) = bounded lattice rows, never
    * corpus-shaped — exactly how an exact test stays feasible at 100 TB
    * (enumerate per GROUP over a fixed panel, not per row). */
  def permTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    permPvalues(spark, dir)
      .select($"nationkey", $"d_obs", $"p_num", $"p_den",
        QueryUtil.halfUp($"p_num".cast("double") / $"p_den", 6).as("p"))
      .orderBy($"nationkey")
  }

  private val permTestOracle =
    s"""WITH $permPvaluesCtes
       |SELECT nationkey, d_obs, p_num, p_den,
       |       floor(CAST(p_num AS DOUBLE) / p_den * 1000000 + 0.5) / 1000000.0 AS p
       |FROM perm_p
       |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- x294

  /** BH level α = 1/20. */
  private val BhAlphaDen = 20L

  /** x294: Benjamini–Hochberg FDR control over x293's EXACT p-values —
    * the multiple-testing step every per-group significance sweep needs
    * (25 nations tested at once inflate false positives). Because the
    * p-values are exact rationals with one shared denominator, the BH
    * predicate `p_(k) ≤ α·k/m` cross-multiplies to pure BIGINTs:
    * `p_num·m·$BhAlphaDen ≤ p_den·k` — no float thresholds anywhere.
    * `k_max` is the largest passing rank; rejected = rank ≤ k_max (the
    * step-up rule, including non-passing ranks below k_max).
    *
    * Scale: runs on the per-GROUP p-value panel (|groups| rows), free at
    * any corpus size once x293's census is done. */
  def bhFdr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = permPvalues(spark, dir).localCheckpoint(true)
    val m = p.agg(count(lit(1)).as("m"))
    val ranked = p.crossJoin(broadcast(m))
      .withColumn("k", row_number().over(Window.orderBy($"p_num", $"nationkey")).cast("long"))
      .withColumn("pass", $"p_num" * $"m" * BhAlphaDen <= $"p_den" * $"k")
    val kmax = ranked.agg(max(when($"pass", $"k").otherwise(0L)).as("k_max"))
    ranked.crossJoin(broadcast(kmax))
      .select($"nationkey", $"p_num", $"p_den", $"k", $"m",
        $"pass".cast("long").as("pass"),
        ($"k" <= $"k_max").cast("long").as("rejected"))
      .orderBy($"nationkey")
  }

  private val bhFdrOracle =
    s"""WITH $permPvaluesCtes,
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM perm_p),
       |rk AS (
       |  SELECT nationkey, p_num, p_den, m,
       |         CAST(row_number() OVER (ORDER BY p_num, nationkey) AS BIGINT) AS k
       |  FROM perm_p, mm),
       |fl AS (SELECT *, (p_num * m * $BhAlphaDen <= p_den * k) AS pass FROM rk),
       |km AS (SELECT max(CASE WHEN pass THEN k ELSE 0 END) AS k_max FROM fl)
       |SELECT nationkey, p_num, p_den, k, m,
       |       CAST(CASE WHEN pass THEN 1 ELSE 0 END AS BIGINT) AS pass,
       |       CAST(CASE WHEN k <= k_max THEN 1 ELSE 0 END AS BIGINT) AS rejected
       |FROM fl, km
       |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- x296

  /** x296: Hodges–Lehmann pseudo-median per return flag — the robust
    * location ESTIMATOR associated with x270's Mann–Whitney test (the
    * test says "shifted?"; this says "by how much"): the median of all
    * n(n+1)/2 pairwise Walsh averages (xᵢ+xⱼ)/2, i ≤ j. Computed
    * entirely on the VALUE CENSUS: pair SUMS come from the census
    * self-join (v ≤ w with multiplicity c·d, and c·(c+1)/2 on the
    * diagonal), the median is read off cumulative pair counts (x280's
    * rank recipe) — never an n²-row expansion. Median convention: the
    * TEXTBOOK estimator — with an even pair count the two middle Walsh
    * averages are mid-averaged (ADVICE r12; the lower-median shortcut
    * can sit half a step off). All of it stays BIGINT-exact: `hl4` is
    * the sum of the doubled Walsh sums at ranks ⌈n/2⌉ and ⌊n/2⌋+1
    * (equal when n_pairs is odd), and the published estimate is
    * hl4/4 with half-up rounding.
    *
    * Scale: |distinct values|² census pairs per group (quantities have
    * ~50 distinct values regardless of corpus size) while the pair
    * COUNT n(n+1)/2 only appears as arithmetic — the reason a
    * pairwise-defined estimator is still computable on 10¹¹-row
    * groups. */
  def hodgesLehmann(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("grp"), $"l_quantity".cast("long").as("v"))
      .groupBy($"grp", $"v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val pairs = census.toDF("grp", "v", "c")
      .join(census.toDF("grp", "w", "d"), Seq("grp"))
      .filter($"v" <= $"w")
      .select($"grp", ($"v" + $"w").as("hl2"),
        expr("CASE WHEN v < w THEN c * d ELSE c * (c + 1) DIV 2 END").as("cnt"))
      .groupBy($"grp", $"hl2").agg(sum($"cnt").as("cnt"))
    val w = Window.partitionBy($"grp").orderBy($"hl2")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = pairs
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("before", $"cum" - $"cnt")
    val ranks = pairs.groupBy($"grp").agg(sum($"cnt").as("n_pairs"))
      .withColumn("k_lo", expr("(n_pairs + 1) DIV 2"))
      .withColumn("k_hi", expr("n_pairs DIV 2 + 1"))
    cum.join(broadcast(ranks), "grp")
      .filter(($"before" < $"k_lo" && $"cum" >= $"k_lo") ||
        ($"before" < $"k_hi" && $"cum" >= $"k_hi"))
      .groupBy($"grp", $"n_pairs")
      .agg(
        (max(when($"before" < $"k_lo" && $"cum" >= $"k_lo", $"hl2")) +
          max(when($"before" < $"k_hi" && $"cum" >= $"k_hi", $"hl2"))).as("hl4"))
      .select($"grp", $"n_pairs", $"hl4",
        QueryUtil.halfUp($"hl4".cast("double") / 4.0, 6).as("hl"))
      .orderBy($"grp")
  }

  private val hodgesLehmannOracle =
    """WITH census AS MATERIALIZED (
      |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.grp, a.v + b.v AS hl2,
      |         CAST(sum(CASE WHEN a.v < b.v THEN a.c * b.c
      |                       ELSE a.c * (a.c + 1) // 2 END) AS BIGINT) AS cnt
      |  FROM census a JOIN census b ON a.grp = b.grp AND a.v <= b.v
      |  GROUP BY a.grp, a.v + b.v),
      |cum AS (
      |  SELECT grp, hl2, cnt,
      |         CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY hl2
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM pairs),
      |rk AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_pairs,
      |              (sum(cnt) + 1) // 2 AS k_lo,
      |              sum(cnt) // 2 + 1 AS k_hi
      |       FROM pairs GROUP BY grp),
      |mid AS (
      |  SELECT c.grp, r.n_pairs,
      |         CAST(max(CASE WHEN c.cum - c.cnt < r.k_lo AND c.cum >= r.k_lo
      |                       THEN c.hl2 END) +
      |              max(CASE WHEN c.cum - c.cnt < r.k_hi AND c.cum >= r.k_hi
      |                       THEN c.hl2 END) AS BIGINT) AS hl4
      |  FROM cum c JOIN rk r ON r.grp = c.grp
      |  WHERE (c.cum - c.cnt < r.k_lo AND c.cum >= r.k_lo)
      |     OR (c.cum - c.cnt < r.k_hi AND c.cum >= r.k_hi)
      |  GROUP BY c.grp, r.n_pairs)
      |SELECT grp, n_pairs, hl4,
      |       floor(CAST(hl4 AS DOUBLE) / 4.0 * 1000000 + 0.5) / 1000000.0 AS hl
      |FROM mid
      |ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------- x297

  /** Neighborhood size for the margin denominators. */
  private val MarginK = 10

  /** x297: margin-based bitext mining (the Artetxe–Schwenk RATIO margin,
    * the standard parallel-corpus miner for multilingual training data):
    * split the embedding table into a "source" side (even vec_id) and
    * "target" side (odd), score every cross pair by
    * `margin(a,b) = sim(a,b) / ((r(a) + r(b)) / 2)` with r(x) = mean
    * similarity of x's [[MarginK]] nearest cross-side neighbors, and
    * mine the pairs where a's best target and b's best source agree
    * (mutual top-1). Arithmetic contract: cosines quantize to 1e-6
    * fixed point (the x216 recipe); similarities shift to [0, 2e6] so
    * every margin is positive-definite; the margin ranking key is the
    * integer `(sim_shift · 1e6) div (r_a + r_b)` — floor of an exact
    * rational, so both engines rank identically (x216's CSLS is the
    * DIFFERENCE margin; this is the ratio variant the mining literature
    * actually uses, plus the mutual-agreement gate).
    *
    * Scale: r comes from the kNN pass (brute here; IVF/LSH candidates at
    * scale — x238's swap), the pair stage is src×tgt with the smaller
    * side broadcast, and top-1 runs as the bounded topk_pairs aggregate
    * (map-side k rows, no n² window shuffle). */
  def marginBitext(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        Similarity.dot($"embedding", $"embedding").as("n2"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val src = emb.filter($"vec_id" % 2 === 0).toDF("a", "av", "n2a")
    val tgt = emb.filter($"vec_id" % 2 === 1).toDF("b", "bv", "n2b")
    // sim shifted to [0, 2e6]: cos fixed-point + 1e6. The n_src×n_tgt pair
    // frame must NEVER materialize into the storage pool (a localCheckpoint
    // here pinned ~1e8 rows at sf1 and starved execution memory — caught by
    // the r12 scale sweep, SparkOutOfMemoryError): instead ONE explicit
    // exchange on `a` is the reuse point all four consumers (r_a, r_b,
    // fwd, bwd) read via AQE stage reuse — shuffle data spills to disk
    // natively, and the 64-dim dot products compute once, not four times.
    val pairs = src.join(broadcast(tgt), $"a" =!= $"b")
      .select($"a", $"b",
        (expr("CAST(floor(vec_dot(av, bv) / sqrt(n2a * n2b) * 1000000 + 0.5) AS BIGINT)")
          + 1000000L).as("sim_fp"))
      .repartition($"a")
    val rA = pairs.groupBy($"a")
      .agg(expr(s"topk_pairs(sim_fp, b, $MarginK)").as("top"))
      .select($"a", expr("aggregate(top, 0L, (acc, x) -> acc + x.v) div size(top)").as("r_a"))
      .localCheckpoint(true)
    val rB = pairs.groupBy($"b")
      .agg(expr(s"topk_pairs(sim_fp, a, $MarginK)").as("top"))
      .select($"b", expr("aggregate(top, 0L, (acc, x) -> acc + x.v) div size(top)").as("r_b"))
      .localCheckpoint(true)
    // scored pairs stay a streaming view over the reused exchange; top-1s
    // come out of bounded topk aggregates (map-side k rows, no n² shuffle)
    val scored = pairs
      .join(broadcast(rA), "a").join(broadcast(rB), "b")
      .select($"a", $"b", $"sim_fp",
        expr("(sim_fp * 1000000L) div (r_a + r_b)").as("margin_fp"))
    val fwd = scored.groupBy($"a")
      .agg(expr("topk_pairs(margin_fp, b, 1)").as("t"))
      .select($"a", $"t"(0).getField("id").as("b"),
        $"t"(0).getField("v").as("margin_fp"))
    val bwd = scored.groupBy($"b")
      .agg(expr("topk_pairs(margin_fp, a, 1)").as("t"))
      .select($"b", $"t"(0).getField("id").as("a"))
    // recover cos for the mined pairs from the EMBEDDINGS (|mined| ≈ n_src
    // rows) instead of joining the n² scored frame a third time
    val mined = fwd.join(bwd, Seq("a", "b")) // mutual top-1 agreement
    mined
      .join(emb.select($"vec_id".as("a"), $"embedding".as("av"), $"n2".as("n2a")), "a")
      .join(emb.select($"vec_id".as("b"), $"embedding".as("bv"), $"n2".as("n2b")), "b")
      .select($"a", $"b", $"margin_fp",
        expr("CAST(floor(vec_dot(av, bv) / sqrt(n2a * n2b) * 1000000 + 0.5) AS BIGINT)")
          .as("cos_fp"))
      .orderBy($"a")
  }

  private val marginBitextOracle = {
    val cos =
      """CAST(floor(list_sum(list_transform(range(1, len(s.embedding) + 1),
        |    i -> CAST(s.embedding[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)))
        |  / (sqrt(s.n2) * sqrt(t.n2)) * 1000000 + 0.5) AS BIGINT)""".stripMargin
    s"""WITH norms AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |         list_sum(list_transform(range(1, len(embedding) + 1),
       |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
       |           AS n2
       |  FROM embeddings),
       |pairs AS MATERIALIZED (
       |  SELECT s.vec_id AS a, t.vec_id AS b, $cos + 1000000 AS sim_fp
       |  FROM norms s JOIN norms t
       |    ON s.vec_id % 2 = 0 AND t.vec_id % 2 = 1),
       |ra AS (SELECT a, CAST(sum(sim_fp) // count(*) AS BIGINT) AS r_a FROM (
       |         SELECT a, sim_fp,
       |                row_number() OVER (PARTITION BY a ORDER BY sim_fp DESC, b) AS rk
       |         FROM pairs) WHERE rk <= $MarginK GROUP BY a),
       |rb AS (SELECT b, CAST(sum(sim_fp) // count(*) AS BIGINT) AS r_b FROM (
       |         SELECT b, sim_fp,
       |                row_number() OVER (PARTITION BY b ORDER BY sim_fp DESC, a) AS rk
       |         FROM pairs) WHERE rk <= $MarginK GROUP BY b),
       |scored AS MATERIALIZED (
       |  SELECT p.a, p.b, sim_fp,
       |         CAST((sim_fp * 1000000) // (r_a + r_b) AS BIGINT) AS margin_fp
       |  FROM pairs p JOIN ra ON ra.a = p.a JOIN rb ON rb.b = p.b),
       |fwd AS (SELECT a, b, margin_fp FROM (
       |          SELECT a, b, margin_fp,
       |                 row_number() OVER (PARTITION BY a ORDER BY margin_fp DESC, b) AS rk
       |          FROM scored) WHERE rk = 1),
       |bwd AS (SELECT a, b FROM (
       |          SELECT a, b, margin_fp,
       |                 row_number() OVER (PARTITION BY b ORDER BY margin_fp DESC, a) AS rk
       |          FROM scored) WHERE rk = 1)
       |SELECT f.a, f.b, f.margin_fp, sc.sim_fp - 1000000 AS cos_fp
       |FROM fwd f JOIN bwd w ON w.a = f.a AND w.b = f.b
       |JOIN scored sc ON sc.a = f.a AND sc.b = f.b
       |ORDER BY f.a""".stripMargin
  }

  // ---------------------------------------------------------------- x298

  private val PackBudgets = Seq(128L, 256L, 512L, 1024L)
  private val WasteShards = 8L

  /** x298: padding-vs-packing waste audit — the budget-sweep arithmetic
    * behind the packing decision every pretraining pipeline makes: for
    * each sequence budget B, padding each document to its own
    * ceil(n_tok/B) sequences wastes `Σ(ceil·B − n_tok)` token slots,
    * while concat-packing (x50's layout) wastes only the final partial
    * sequence per shard: `Σ_shard (ceil(tot/B)·B − tot)`. All BIGINT
    * (integer ceil via (n + B − 1) div B); the published waste
    * fractions round half-up at 1e-6.
    *
    * Scale: one corpus scan for the per-doc token counts, one
    * shard-level census — the sweep itself runs on |budgets| × |shards|
    * rows. */
  def padVsPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id",
        size(filter(split($"text", " "), w => length(w) > 0))
          .cast("long").as("n_tok"))
      .localCheckpoint(true)
    val budgets = PackBudgets.toDF("budget")
    val pad = toks.crossJoin(broadcast(budgets))
      .groupBy($"budget")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("total_tok"),
        sum(expr("((n_tok + budget - 1) div budget) * budget - n_tok"))
          .as("pad_waste"))
    val shardTot = toks.groupBy(($"doc_id" % WasteShards).as("shard"))
      .agg(sum($"n_tok").as("tot"))
    val pack = shardTot.crossJoin(broadcast(budgets))
      .groupBy($"budget")
      .agg(sum(expr("((tot + budget - 1) div budget) * budget - tot"))
        .as("pack_waste"))
    pad.join(pack, "budget")
      .select($"budget", $"n_docs", $"total_tok", $"pad_waste", $"pack_waste",
        QueryUtil.halfUp($"pad_waste".cast("double")
          / ($"total_tok" + $"pad_waste"), 6).as("pad_frac"),
        QueryUtil.halfUp($"pack_waste".cast("double")
          / ($"total_tok" + $"pack_waste"), 6).as("pack_frac"))
      .orderBy($"budget")
  }

  private val padVsPackOracle = {
    val budgets = PackBudgets.mkString("(", "), (", ")")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
       |              AS BIGINT) AS n_tok
       |  FROM documents),
       |bud AS (SELECT CAST(budget AS BIGINT) AS budget
       |        FROM (VALUES $budgets) t(budget)),
       |pad AS (
       |  SELECT budget, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_tok) AS BIGINT) AS total_tok,
       |         CAST(sum(((n_tok + budget - 1) // budget) * budget - n_tok)
       |              AS BIGINT) AS pad_waste
       |  FROM toks, bud GROUP BY budget),
       |st AS (SELECT doc_id % $WasteShards AS shard, CAST(sum(n_tok) AS BIGINT) AS tot
       |       FROM toks GROUP BY 1),
       |pk AS (
       |  SELECT budget,
       |         CAST(sum(((tot + budget - 1) // budget) * budget - tot)
       |              AS BIGINT) AS pack_waste
       |  FROM st, bud GROUP BY budget)
       |SELECT pad.budget, n_docs, total_tok, pad_waste, pack_waste,
       |       floor(CAST(pad_waste AS DOUBLE) / (total_tok + pad_waste)
       |             * 1000000 + 0.5) / 1000000.0 AS pad_frac,
       |       floor(CAST(pack_waste AS DOUBLE) / (total_tok + pack_waste)
       |             * 1000000 + 0.5) / 1000000.0 AS pack_frac
       |FROM pad JOIN pk ON pk.budget = pad.budget
       |ORDER BY pad.budget""".stripMargin
  }

  // ---------------------------------------------------------------- x295

  /** x295: recursive CTE parity — Spark 4's `WITH RECURSIVE` (new SQL
    * surface in the 4.x line) against DuckDB's, on a transitive-closure
    * workload: suppliers form an implicit binary tree (parent(k) = k div
    * 2, root 1), the recursion walks root→leaves accumulating depth and
    * the path's account-balance cents, and the published result is the
    * per-depth census (node count, path-cents total, key range). Both
    * engines run the same anchor + UNION ALL step; arithmetic is BIGINT
    * end-to-end.
    *
    * Scale: recursion depth is log₂(keys) (~24 levels at 16M nodes);
    * each step is one equi-join of the frontier against the static
    * table — the iterative-fixpoint shape Graph.scala implements by
    * hand, now exercised through the ENGINE's own recursion operator. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // node key = s_suppkey + 1: fixture keys start at 0, and a div-2 tree
    // rooted at 1 only covers keys >= 1 — the shift makes the closure
    // visit EVERY supplier exactly once (Round12Spec pins that invariant)
    Tables.supplier(spark, dir)
      .select(($"s_suppkey" + 1).as("k0"),
        floor($"s_acctbal" * 100 + 0.5).cast("long").as("cents"))
      .createOrReplaceTempView("x295_sup")
    spark.sql(
      """WITH RECURSIVE h(k, depth, path_cents) AS (
        |  SELECT k0, CAST(1 AS BIGINT), cents
        |  FROM x295_sup WHERE k0 = 1
        |  UNION ALL
        |  SELECT s.k0, h.depth + 1, h.path_cents + s.cents
        |  FROM x295_sup s JOIN h ON s.k0 div 2 = h.k
        |  WHERE s.k0 > 1)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
        |       CAST(sum(path_cents) AS BIGINT) AS path_cents,
        |       min(k) AS min_key, max(k) AS max_key
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
  }

  private val recursiveCteOracle =
    """WITH RECURSIVE s AS (
      |  SELECT s_suppkey + 1 AS k0,
      |         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM supplier),
      |h(k, depth, path_cents) AS (
      |  SELECT k0, CAST(1 AS BIGINT), cents FROM s WHERE k0 = 1
      |  UNION ALL
      |  SELECT s.k0, h.depth + 1, h.path_cents + s.cents
      |  FROM s JOIN h ON s.k0 // 2 = h.k
      |  WHERE s.k0 > 1)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(sum(path_cents) AS BIGINT) AS path_cents,
      |       min(k) AS min_key, max(k) AS max_key
      |FROM h GROUP BY depth ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------- x299

  /** Micro-batch slice cuts (x207's convention) — three files ⇒ state
    * crosses two real micro-batch boundaries. */
  private val SliceCuts = Seq(1704800000L, 1705800000L)

  /** Deterministic user sample for x299 (bounds the emitted panel). */
  private val MapUserMod = 20L

  private def stageEventSlices(spark: SparkSession, dir: String, base: String,
                               df: DataFrame): Unit = {
    import spark.implicits._
    val bounds = (Long.MinValue +: SliceCuts) zip (SliceCuts :+ Long.MaxValue)
    // r16: snapshot once — slices filter the checkpoint, not a re-scan
    val snap = df.localCheckpoint(true)
    QueryUtil.stageFrames(
      bounds.map { case (lo, hi) => snap.filter($"sec" >= lo && $"sec" < hi) },
      s"$base/src")
  }

  /** x299: `transformWithState` MAP-STATE batch parity — per-user counts
    * keyed by event type in an explicit `MapState[String, Long]`
    * ([[graft.streaming.IncrementalStream.TwsTypeCountProcessor]]),
    * streamed over three chronological slices so individual map ENTRIES
    * (not whole-user blobs) survive micro-batch boundaries on RocksDB.
    * The last emission per (user, type) — counts only grow, so max(n) —
    * must equal the batch `GROUP BY user_id, event_type` count. Closes
    * the state-variable API matrix: ValueState (x207), timers (x231),
    * MapState (this), ListState (x300).
    *
    * Scale: state is O(users × touched types) individual store entries;
    * a batch writes only the entries it touches — the property that
    * distinguishes MapState from a ValueState-of-map at wide per-key
    * domains. Sampled to user_id % [[MapUserMod]] = 0 to keep the
    * emitted panel bounded (the state machine is identical). */
  def twsMapParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x299").toString
    val ev = Tables.events(spark, dir)
      .filter($"user_id" % MapUserMod === 0)
      .select($"user_id", $"event_type",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
    stageEventSlices(spark, dir, base, ev)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val counts = graft.streaming.IncrementalStream.twsTypeCounts(
      stream.select($"user_id", $"event_type").as[(Long, String)])
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, counts.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    emitted.groupBy($"user_id", $"event_type")
      .agg(max($"n").as("n"))
      .orderBy($"user_id", $"event_type")
  }

  private val twsMapParityOracle =
    s"""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
       |FROM events
       |WHERE user_id % $MapUserMod = 0
       |GROUP BY user_id, event_type
       |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- x300

  /** x300: `transformWithState` LIST-STATE batch parity — every purchase
    * APPENDS its cents to an explicit `ListState[Long]`
    * ([[graft.streaming.IncrementalStream.TwsListProcessor]]; an O(1)
    * store append, the event-log state shape), and each batch's emission
    * re-derives order-free aggregates (count, sum, min) from a full list
    * scan. The last emission per user must equal the batch aggregate —
    * which proves the appended log held exactly the input rows across
    * micro-batch boundaries, no loss, no duplication.
    *
    * Scale: appends are O(rows in batch); the per-batch list scan is the
    * deliberate parity device (a production op would emit the appended
    * deltas) — state size is the user's full event log, the shape
    * ListState exists to store. */
  def twsListParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x300").toString
    val ev = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        floor($"value" * 100 + 0.5).cast("long").as("cents"),
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
    stageEventSlices(spark, dir, base, ev)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val sums = graft.streaming.IncrementalStream.twsPurchaseLog(
      stream.select($"user_id", $"cents").as[(Long, Long)])
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, sums.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    // last emission per user = maximal running count (monotone)
    emitted.groupBy($"user_id")
      .agg(max(struct($"n", $"cents", $"min_cents")).as("s"))
      .select($"user_id", $"s.n".as("n"), $"s.cents".as("cents"),
        $"s.min_cents".as("min_cents"))
      .orderBy($"user_id")
  }

  private val twsListParityOracle =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS BIGINT) AS cents,
      |       CAST(min(cents) AS BIGINT) AS min_cents
      |FROM (SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |      FROM events WHERE event_type = 'purchase') p
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- x301

  /** Katz attenuation 1/[[KatzAlphaDen]] and unrolled iteration count.
    * The trade graph has ≤ 24 out-edges per nation, so λmax ≤ 24 <
    * [[KatzAlphaDen]] guarantees convergence and the scaled-integer
    * trajectory stays far inside BIGINT (n_i ≤ 32^i · 32/8). */
  private val KatzAlphaDen = 32L
  private val KatzIters = 6

  /** x301: Katz centrality over the unweighted nation trade graph —
    * PageRank (x63) normalizes by out-degree, HITS (x77) by the
    * authority/hub split; Katz counts ALL walks into a node, length-k
    * walks attenuated by α^k: x = Σ_k α^k (Aᵀ)^k·1. Unrolled
    * [[KatzIters]] iterations of `x_{i+1} = 1 + α·Aᵀx_i` in EXACT
    * integers: n_i = x_i·32^i, so `n_{i+1}(v) = 32^{i+1} +
    * Σ_{u→v} n_i(u)` is pure BIGINT and the centrality ranking is
    * bit-stable cross-engine (the x63/x77 discipline, third member of
    * the family).
    *
    * Scale: k sparse matrix-vector joins, each a groupBy on dst —
    * iteration localCheckpoints so the unrolled lineage never
    * re-executes. */
  def katzCentrality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trade = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
    val edges = trade
      .unionByName(trade.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(true)
    val nodes = edges.select($"src".as("node")).distinct().localCheckpoint(true)
    val x0 = nodes.withColumn("n", lit(1L))
    val xFinal = (1 to KatzIters).foldLeft(x0) { (x, i) =>
      val scale = math.pow(KatzAlphaDen.toDouble, i).toLong
      val inc = edges.join(x.withColumnRenamed("node", "src"), "src")
        .groupBy($"dst".as("node")).agg(sum($"n").as("inc"))
      nodes.join(inc, Seq("node"), "left")
        .select($"node", (lit(scale) + coalesce($"inc", lit(0L))).as("n"))
        .localCheckpoint(true)
    }
    xFinal
      .join(broadcast(Tables.nation(spark, dir)), $"node" === $"n_nationkey")
      .select($"node".cast("long").as("nationkey"), $"n_name",
        $"n".as("katz_num"),
        QueryUtil.halfUp($"n".cast("double")
          / math.pow(KatzAlphaDen.toDouble, KatzIters), 6).as("katz"))
      .orderBy($"katz_num".desc, $"nationkey")
  }

  private val katzOracle = {
    def iter(prev: String, cur: String, i: Int): String = {
      val scale = math.pow(KatzAlphaDen.toDouble, i).toLong
      s"""$cur AS MATERIALIZED (
         |  SELECT n.node,
         |         $scale + COALESCE(s.inc, 0) AS n
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(x.n) AS BIGINT) AS inc
         |    FROM edges e JOIN $prev x ON x.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }
    val iters = (1 to KatzIters)
      .map(i => iter(s"x${i - 1}", s"x$i", i)).mkString(",\n")
    val denom = math.pow(KatzAlphaDen.toDouble, KatzIters)
    s"""WITH trade AS MATERIALIZED (
       |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM trade
       |  UNION SELECT dst, src FROM trade),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |x0 AS (SELECT node, CAST(1 AS BIGINT) AS n FROM nodes),
       |$iters
       |SELECT CAST(x.node AS BIGINT) AS nationkey, n_name,
       |       x.n AS katz_num,
       |       floor(CAST(x.n AS DOUBLE) / $denom * 1000000 + 0.5) / 1000000.0
       |         AS katz
       |FROM x$KatzIters x JOIN nation ON n_nationkey = x.node
       |ORDER BY katz_num DESC, nationkey""".stripMargin
  }

  // ---------------------------------------------------------------- x302

  /** Contamination gram width (x237's span granularity). */
  private val ContamSpanG = 8

  /** x302: longest contaminated SPAN per training document — x51/x16
    * count shared fingerprints (how MANY grams leak); the actionable
    * decontamination metric is how LONG the longest leaked run is (a
    * 7-token overlap is phrase reuse; a 200-token run is a copied eval
    * record). Every training-doc 8-gram present anywhere in the eval
    * split (doc_id % 40 = 0) marks its covered token interval; per doc,
    * overlap-or-touch intervals merge (x237's array-local island fold)
    * and the report gives the span count, total covered tokens, and the
    * MAX single span length. Only contaminated docs emit rows.
    *
    * Scale: one gram explode + an equi-join against the (distinct,
    * much smaller) eval gram set, then per-doc array-local folds — no
    * window over the corpus, no pairwise doc join. */
  def contamSpan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val G = ContamSpanG
    // native one-pass G-grams (r16, same rewrite as x237): identical
    // in-order gram list, [] for short docs — the lambda form re-ran
    // slice+concat through the HOF interpreter per element
    val grams = Tables.documents(spark, dir).select($"doc_id",
      posexplode(call_function("token_ngrams", $"text", lit(G)))
        .as(Seq("p0", "gram")))
      .select($"doc_id", ($"p0" + 1).as("p"), $"gram")
    val evalGrams = grams.filter($"doc_id" % 40 === 0)
      .select($"gram").distinct()
    val hits = grams.filter($"doc_id" % 40 =!= 0)
      .join(evalGrams, "gram")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"p")).as("ps"))
    val spansExpr = expr(
      s"""aggregate(ps,
         |  cast(array() as array<struct<s:int,e:int>>),
         |  (acc, p) -> CASE
         |    WHEN size(acc) = 0 OR p > element_at(acc, -1).e + 1
         |      THEN concat(acc, array(named_struct('s', p, 'e', p + ${G - 1})))
         |    ELSE concat(slice(acc, 1, size(acc) - 1),
         |           array(named_struct('s', element_at(acc, -1).s,
         |                              'e', p + ${G - 1})))
         |  END)""".stripMargin)
    hits.select($"doc_id", spansExpr.as("runs"))
      .select($"doc_id",
        size($"runs").cast("long").as("n_spans"),
        expr("aggregate(runs, 0L, (a, r) -> a + r.e - r.s + 1)").as("contam_toks"),
        expr("aggregate(runs, 0L, (a, r) -> greatest(a, CAST(r.e - r.s + 1 AS BIGINT)))")
          .as("max_span"))
      .orderBy("doc_id")
  }

  private val contamSpanOracle = {
    val G = ContamSpanG
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, CAST(u.i AS INTEGER) AS p,
       |        array_to_string(toks[CAST(u.i AS INTEGER):CAST(u.i AS INTEGER) + ${G - 1}], ' ') AS gram
       |      FROM t, LATERAL unnest(range(1, greatest(len(toks) - ${G - 2}, 1))) AS u(i)
       |      WHERE len(toks) >= $G),
       |eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 40 = 0),
       |dp AS (SELECT doc_id, p FROM g JOIN eg USING (gram) WHERE doc_id % 40 <> 0),
       |brk AS (SELECT doc_id, p,
       |          CASE WHEN lag(p) OVER w IS NULL
       |                 OR p > lag(p) OVER w + $G THEN 1 ELSE 0 END AS new_run
       |        FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
       |runs AS (SELECT doc_id, p,
       |           sum(new_run) OVER (PARTITION BY doc_id ORDER BY p
       |                              ROWS UNBOUNDED PRECEDING) AS run_id
       |         FROM brk),
       |agg AS (SELECT doc_id, run_id, min(p) AS s, max(p) + ${G - 1} AS e
       |        FROM runs GROUP BY doc_id, run_id)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_spans,
       |       CAST(sum(e - s + 1) AS BIGINT) AS contam_toks,
       |       CAST(max(e - s + 1) AS BIGINT) AS max_span
       |FROM agg
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x303

  /** Token-bucket contract for x303: 2-token bucket, one token per 6 h. */
  private val BucketCap = 2L
  private val BucketRefillSec = 21600L

  /** x303: token-bucket rate limiter batch parity — per-user admission
    * control ([[graft.streaming.IncrementalStream.TwsTokenBucketProcessor]]:
    * [[BucketCap]]-token bucket, one token per [[BucketRefillSec]] s,
    * exact integer refill progress, full bucket pins the refill clock)
    * streamed over three chronological slices. Unlike every prior
    * stateful parity (counts/sums/sessions re-derivable by a keyed
    * aggregate), admission DECISIONS feed back into state — there is no
    * closed form, so the oracle runs the IDENTICAL sequential fold with
    * `list_reduce` over the per-user (sec, event_id)-ordered event list;
    * each list element is pre-encoded as "state if this event were
    * first" so reduce's acc-type-equals-element-type contract holds.
    * Last emission per user (admitted and dropped both monotone) must
    * equal the fold.
    *
    * Scale: state is 4 longs per key; the per-batch work is the batch's
    * own rows — the admission primitive every ingestion edge needs
    * (crawl politeness, API quotas), running where the data already is
    * instead of a bottleneck gateway. */
  def tokenBucketParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x303").toString
    val ev = Tables.events(spark, dir)
      .select($"user_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        $"event_id")
    stageEventSlices(spark, dir, base, ev)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val stats = graft.streaming.IncrementalStream.twsTokenBucket(
      stream.select($"user_id", $"sec", $"event_id").as[(Long, Long, Long)],
      BucketCap, BucketRefillSec)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, stats.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    emitted.groupBy($"user_id")
      .agg(max($"admitted").as("admitted"), max($"dropped").as("dropped"))
      .orderBy($"user_id")
  }

  private val tokenBucketParityOracle = {
    // NOT list_reduce: DuckDB 1.0.0 mis-evaluates multi-field struct
    // accumulators under list_reduce (minimal repro: a 2-field fold whose
    // CASE reads one field while updating another counts the branch
    // inconsistently — isolated steps fold correctly, longer lists drift).
    // The sequential fold runs as a recursive CTE instead: one frontier
    // row per user per step, depth = max events/user (≤ ~100 at all SFs).
    val (c, r) = (BucketCap, BucketRefillSec)
    val g = s"((e.sec - st.lst) // $r)"
    val tok1 = s"(CASE WHEN st.tok + $g >= $c THEN $c ELSE st.tok + $g END)"
    val last1 = s"(CASE WHEN st.tok + $g >= $c THEN e.sec ELSE st.lst + $g * $r END)"
    s"""WITH RECURSIVE ev AS MATERIALIZED (
       |  SELECT user_id, sec,
       |         CAST(row_number() OVER (PARTITION BY user_id
       |                                 ORDER BY sec, event_id) AS BIGINT) AS i
       |  FROM (SELECT user_id,
       |               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
       |               event_id
       |        FROM events)),
       |mx AS (SELECT user_id, max(i) AS n FROM ev GROUP BY user_id),
       |st AS (
       |  SELECT user_id, CAST(1 AS BIGINT) AS i, CAST(${c - 1} AS BIGINT) AS tok,
       |         sec AS lst, CAST(1 AS BIGINT) AS adm, CAST(0 AS BIGINT) AS drp
       |  FROM ev WHERE i = 1
       |  UNION ALL
       |  SELECT st.user_id, st.i + 1,
       |         CAST(CASE WHEN $tok1 >= 1 THEN $tok1 - 1 ELSE $tok1 END AS BIGINT),
       |         CAST($last1 AS BIGINT),
       |         CAST(st.adm + CASE WHEN $tok1 >= 1 THEN 1 ELSE 0 END AS BIGINT),
       |         CAST(st.drp + CASE WHEN $tok1 >= 1 THEN 0 ELSE 1 END AS BIGINT)
       |  FROM st JOIN ev e ON e.user_id = st.user_id AND e.i = st.i + 1)
       |SELECT st.user_id, adm AS admitted, drp AS dropped
       |FROM st JOIN mx ON mx.user_id = st.user_id AND st.i = mx.n
       |ORDER BY st.user_id""".stripMargin
  }

  // ---------------------------------------------------------------- x304

  /** x304: percentile_cont / percentile_disc engine-surface parity — the
    * SQL-standard WITHIN GROUP quantile pair pinned against DuckDB's
    * quantile_cont/quantile_disc on integer cents. Exactness argument:
    * at dyadic p ∈ {¼, ½, ¾} the rank r = p·(n−1) and its fraction g are
    * exact binary fractions, and the interpolation over integer cents
    * (≤ 2⁵³) multiplies integers by exact dyadic g — so BOTH engines'
    * doubles are bit-identical REGARDLESS of their interpolation formula
    * (a+g·(b−a) vs (1−g)·a+g·b), and the pin needs no rounding at all.
    * percentile_disc returns an actual element (cast back to BIGINT).
    *
    * Scale: builtin sketch-free exact percentiles sort within groups
    * (SIX sort-based aggregates here — measured ~7 s over the full
    * sf0.1 fact table), so the pin runs on a deterministic 1-in-10
    * orderkey sample: engine-semantics agreement needs representative
    * sizes, not the whole corpus. At 100 TB use the census-rank recipe
    * (q72/x280); this pin is about SEMANTICS, not the scale path. */
  def percentileParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" % 10 === 0)
      .select($"l_returnflag".as("grp"),
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("v"))
      .createOrReplaceTempView("x304_v")
    spark.sql(
      """SELECT grp,
        |       percentile(v, 0.25D) AS p25,
        |       percentile(v, 0.5D)  AS p50,
        |       percentile(v, 0.75D) AS p75,
        |       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT) AS d25,
        |       CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS BIGINT) AS d50,
        |       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS BIGINT) AS d75
        |FROM x304_v GROUP BY grp ORDER BY grp""".stripMargin)
  }

  private val percentileParityOracle =
    """WITH v AS (SELECT l_returnflag AS grp,
      |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      |           FROM lineitem WHERE l_orderkey % 10 = 0)
      |SELECT grp,
      |       quantile_cont(v, 0.25) AS p25,
      |       quantile_cont(v, 0.5)  AS p50,
      |       quantile_cont(v, 0.75) AS p75,
      |       CAST(quantile_disc(v, 0.25) AS BIGINT) AS d25,
      |       CAST(quantile_disc(v, 0.5)  AS BIGINT) AS d50,
      |       CAST(quantile_disc(v, 0.75) AS BIGINT) AS d75
      |FROM v GROUP BY grp ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------- x305

  /** SDXL-style constant-area bucket set (≈ 512² px) and the LCM of the
    * bucket heights, which turns the cross-multiplied aspect distance
    * into ONE integer sort key comparable across buckets. */
  private val AspectBuckets = Seq(
    (0, 512, 512), (1, 448, 576), (2, 576, 448), (3, 384, 640),
    (4, 640, 384), (5, 320, 768), (6, 768, 320))
  private val AspectLcm = 161280L // lcm(512,576,448,640,384,768,320)

  /** x305: aspect-ratio bucketing — the multimodal batching op every
    * image-training pipeline runs (constant-token batches need
    * near-constant-area shapes; bucketing by aspect ratio minimizes
    * crop loss). Each decoded image picks the bucket minimizing
    * |w/h − wb/hb|, computed EXACTLY: the distance ordering across
    * buckets cross-multiplies to `|w·hb − h·wb| · (LCM/hb)` — one BIGINT
    * key, deterministic ties by bucket id. The cover-crop loss is the
    * exact rational `|w·hb − h·wb| / max(w·hb, h·wb)`, quantized to ppm
    * by integer division. Published: per-bucket census + total/mean
    * crop ppm.
    *
    * Scale: one narrow map over the decoded metadata (7 literal buckets
    * per image), one group-by — the planning pass that runs BEFORE any
    * pixel moves. */
  def aspectBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = graft.multimodal.Multimodal.decodeMeta(
      graft.multimodal.Multimodal.attachFakeMedia(
        Tables.documents(spark, dir))).toDF()
      .select($"doc_id", $"width".cast("long").as("w"),
        $"height".cast("long").as("h"))
    val buckets = AspectBuckets.toDF("bid", "bw", "bh")
      .select($"bid".cast("long").as("bid"), $"bw".cast("long").as("bw"),
        $"bh".cast("long").as("bh"))
    val scored = meta.crossJoin(broadcast(buckets))
      .withColumn("c", abs($"w" * $"bh" - $"h" * $"bw"))
      .withColumn("key", expr(s"c * ($AspectLcm div bh)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"key", $"bid")))
      .filter($"rk" === 1)
      .withColumn("crop_ppm",
        expr("(c * 1000000L) div greatest(w * bh, h * bw)"))
    scored.groupBy($"bid", $"bw", $"bh")
      .agg(count(lit(1)).as("n_images"),
        sum($"crop_ppm").as("total_crop_ppm"),
        expr("sum(crop_ppm) div count(1)").as("mean_crop_ppm"))
      .orderBy($"bid")
  }

  private val aspectBucketsOracle = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1)"
    val bucketRows = AspectBuckets
      .map { case (id, w, h) => s"($id, $w, $h)" }.mkString(", ")
    s"""WITH meta AS (
       |  SELECT doc_id,
       |         CAST(64 + (${nib(0)} * 16 + ${nib(1)}) % 448 AS BIGINT) AS w,
       |         CAST(64 + (${nib(2)} * 16 + ${nib(3)}) % 448 AS BIGINT) AS h
       |  FROM documents),
       |b AS (SELECT CAST(bid AS BIGINT) AS bid, CAST(bw AS BIGINT) AS bw,
       |             CAST(bh AS BIGINT) AS bh
       |      FROM (VALUES $bucketRows) t(bid, bw, bh)),
       |scored AS (
       |  SELECT doc_id, bid, bw, bh,
       |         abs(w * bh - h * bw) AS c,
       |         abs(w * bh - h * bw) * ($AspectLcm // bh) AS key,
       |         greatest(w * bh, h * bw) AS mx,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY abs(w * bh - h * bw) * ($AspectLcm // bh), bid) AS rk
       |  FROM meta, b)
       |SELECT bid, bw, bh,
       |       CAST(count(*) AS BIGINT) AS n_images,
       |       CAST(sum((c * 1000000) // mx) AS BIGINT) AS total_crop_ppm,
       |       CAST(sum((c * 1000000) // mx) // count(*) AS BIGINT) AS mean_crop_ppm
       |FROM scored WHERE rk = 1
       |GROUP BY bid, bw, bh
       |ORDER BY bid""".stripMargin
  }

  // ---------------------------------------------------------------- x306

  /** Warm-start cut: events before this second seed the initial state;
    * events at/after it stream. */
  private val WarmCutSec = 1705300000L

  /** x306: `transformWithState` INITIAL-STATE batch parity — the
    * warm-start/migration contract
    * ([[graft.streaming.IncrementalStream.TwsWarmStartProcessor]]): a new
    * streaming job inherits per-user (n, cents) purchase totals from the
    * BATCH pipeline it replaces (events before [[WarmCutSec]]) via
    * `handleInitialState`, then folds the post-cut stream (two
    * chronological slices) on top. The last emission per streaming-active
    * user must equal the batch aggregate over the user's ENTIRE history —
    * proving seeded state and streamed folds compose exactly (users with
    * no post-cut activity never emit, so the oracle restricts to users
    * active after the cut). Completes the transformWithState surface
    * matrix: ValueState, timers, MapState, ListState, initial state.
    *
    * Scale: the seed is one batch aggregate shuffled once into the state
    * store's layout — the migration cost is one pass over the OLD
    * pipeline's output, never a replay of raw history. */
  def twsWarmStartParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x306").toString
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        floor($"value" * 100 + 0.5).cast("long").as("cents"),
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"))
    val init = purchases.filter($"sec" < WarmCutSec)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      .select($"user_id", $"n", $"cents").as[(Long, Long, Long)]
    val post = purchases.filter($"sec" >= WarmCutSec).localCheckpoint(true) // r16: one scan for both staged slices
    // two post-cut slices => the seeded state ALSO crosses a micro-batch
    // boundary, not just the batch->stream hand-off
    val mid = WarmCutSec + 1000000L
    QueryUtil.stageFrames(Seq(
      post.filter($"sec" < mid), post.filter($"sec" >= mid)), s"$base/src")
    val stream = spark.readStream.schema(post.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val totals = graft.streaming.IncrementalStream.twsWarmTotals(
      stream.select($"user_id", $"cents").as[(Long, Long)], init)
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, totals.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    emitted.groupBy($"user_id")
      .agg(max($"n").as("n"), max($"cents").as("cents"))
      .orderBy($"user_id")
  }

  private val twsWarmStartParityOracle =
    s"""WITH p AS (
       |  SELECT user_id,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
       |  FROM events WHERE event_type = 'purchase')
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(cents) AS BIGINT) AS cents
       |FROM p
       |GROUP BY user_id
       |HAVING max(CASE WHEN sec >= $WarmCutSec THEN 1 ELSE 0 END) = 1
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- x307

  /** (bands, rows) factorizations of a 24-hash MinHash budget. */
  private val LshConfigs = Seq((24, 1), (12, 2), (8, 3), (6, 4), (4, 6),
    (3, 8), (2, 12), (1, 24))
  /** Collision probability at s = (2k+1)/20, as an EXACT rational with
    * denominator 20²⁴: P = 1 − (1 − sʳ)ᵇ ⇒
    * p_num = 20²⁴ − (20ʳ − (2k+1)ʳ)ᵇ (BigInt, ≤ 1.7·10³¹ — fits
    * DECIMAL(38)/HUGEINT with room for the weight products). */
  private def lshPNum(b: Int, r: Int, k: Int): BigInt =
    LshPDen - (BigInt(20).pow(r) - BigInt(2 * k + 1).pow(r)).pow(b)
  private val LshPDen = BigInt(20).pow(24)

  /** x307: LSH band planner — x191 plots the S-curve; this makes the
    * DECISION: given a 24-hash budget, a target threshold τ = 0.7, and
    * the corpus's MEASURED pair-similarity histogram (token-set Jaccard
    * of consecutive-doc pairs, bucketed to the 10-step midpoint grid),
    * rank every (bands, rows) factorization by expected error =
    * Σ_{s<τ} w_s·P(s) + Σ_{s≥τ} w_s·(1−P(s)) — false positives below
    * the threshold plus false negatives above it, weighted by how many
    * real pairs live at each similarity. The S-curve values are exact
    * rationals over 20²⁴ (x87's literal-table discipline: the constants
    * derive from (b,r,k) combinatorics, embedded identically in both
    * engines), the weighted sum is pure DECIMAL(38)/HUGEINT, and the
    * ranking is an exact integer comparison — so the recommended config
    * is oracle-gated, not eyeballed.
    *
    * Scale: the histogram is one narrow pass over consecutive pairs
    * (production would reuse any candidate-pair sample); the plan
    * itself runs on 8 configs × 10 buckets. */
  def lshBandPlanner(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pRows = for ((b, r) <- LshConfigs; k <- 0 to 9)
      yield (b.toLong, r.toLong, k.toLong, lshPNum(b, r, k).toString)
    val p = pRows.toDF("b", "r", "k", "ps")
      .select($"b", $"r", $"k", $"ps".cast("decimal(38,0)").as("p_num"))
    val t = Tables.documents(spark, dir)
      // native sorted-distinct token set (r16): same byte-order sorted set
      // as array_sort(array_distinct(split(...))) without two interpreted
      // HOF passes per doc
      .select($"doc_id", call_function("sorted_token_set", $"text").as("ts"))
    val pairs = t.select(($"doc_id" - 1).as("doc_id"), $"ts".as("tb"))
      .join(t.withColumnRenamed("ts", "ta"), "doc_id")
    val j0 = pairs.select(
      call_function("sorted_intersect_count", $"ta", $"tb").cast("long").as("it"),
      (size($"ta") + size($"tb")).cast("long").as("st"))
    val w = j0.filter($"st" - $"it" > 0)
      .select(least(lit(9L), expr("(10 * it) div (st - it)")).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("wk"))
      .localCheckpoint(true)
    val den = lit(LshPDen.toString).cast("decimal(38,0)")
    val err = p.join(broadcast(w), "k")
      .withColumn("term",
        when($"k" <= 6, $"p_num" * $"wk") // s = (2k+1)/20 < 0.7 ⇔ k ≤ 6
          .otherwise((den - $"p_num") * $"wk"))
      .groupBy($"b", $"r").agg(sum($"term").as("err"))
    val tot = w.agg(sum($"wk").as("tw"))
    err.crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(Window.orderBy($"err", $"b")).cast("long"))
      .select($"rk", $"b", $"r",
        QueryUtil.halfUp($"err".cast("double")
          / (den.cast("double") * $"tw"), 6).as("err_rate"))
      .orderBy($"rk")
  }

  private val lshBandPlannerOracle = {
    val pRows = (for ((b, r) <- LshConfigs; k <- 0 to 9)
      yield s"($b, $r, $k, '${lshPNum(b, r, k)}')").mkString(", ")
    val den = s"CAST('$LshPDen' AS HUGEINT)"
    s"""WITH p AS (
       |  SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
       |         CAST(k AS BIGINT) AS k, CAST(ps AS HUGEINT) AS p_num
       |  FROM (VALUES $pRows) t(b, r, k, ps)),
       |t AS (SELECT doc_id,
       |             list_sort(list_distinct(string_split(text, ' '))) AS ts
       |      FROM documents),
       |pr AS (SELECT a.ts AS ta, b.ts AS tb
       |       FROM t a JOIN t b ON b.doc_id = a.doc_id + 1),
       |j0 AS (SELECT CAST(len(list_filter(ta, s -> list_contains(tb, s)))
       |                AS BIGINT) AS it,
       |              CAST(len(ta) + len(tb) AS BIGINT) AS st
       |       FROM pr),
       |w AS (SELECT least(9, (10 * it) // (st - it)) AS k,
       |             CAST(count(*) AS BIGINT) AS wk
       |      FROM j0 WHERE st - it > 0 GROUP BY 1),
       |e AS (SELECT b, r,
       |        sum(CASE WHEN p.k <= 6 THEN p_num * wk
       |                 ELSE ($den - p_num) * wk END) AS err
       |      FROM p JOIN w ON w.k = p.k GROUP BY b, r),
       |tw AS (SELECT CAST(sum(wk) AS BIGINT) AS tw FROM w)
       |SELECT CAST(row_number() OVER (ORDER BY err, b) AS BIGINT) AS rk,
       |       b, r,
       |       floor(CAST(err AS DOUBLE) / (CAST($den AS DOUBLE) * tw)
       |             * 1000000 + 0.5) / 1000000.0 AS err_rate
       |FROM e, tw
       |ORDER BY rk""".stripMargin
  }

  // ---------------------------------------------------------------- x308

  /** χ²₁(0.05) = 3.841459 as an exact rational. */
  private val CaChi2Num = 3841459L
  private val CaChi2Den = 1000000L

  /** x308: Cochran–Armitage trend test — the ordered-category companion
    * to q71's chi-square independence: does return probability TREND
    * with line number (scores w_i = i)? The statistic is exact integer
    * arithmetic over the 7-row category census:
    * `U = N·Σwᵢaᵢ − A·Σwᵢnᵢ`,
    * `Z² = U²·N / (A·(N−A)·(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²))`, and the α=0.05
    * decision cross-multiplies against 3841459/10⁶ in DECIMAL(38)/
    * HUGEINT — same discipline as x285's KS decision, same documented
    * validity bound style (U²·N·10⁶ ≤ ~10³⁸ holds through ~10⁷ rows per
    * weight unit; beyond that the one surviving row needs BigInt).
    *
    * Scale: one group-by census (|categories| rows), then scalar
    * arithmetic — the trend alarm for ordinal drift at any corpus
    * size. */
  def trendTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.lineitem(spark, dir)
      .select($"l_linenumber".cast("long").as("w"),
        when($"l_returnflag" === "R", 1L).otherwise(0L).as("y"))
      .groupBy($"w").agg(count(lit(1)).as("n"), sum($"y").as("a"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    census.agg(
        sum($"n").as("nn"), sum($"a").as("aa"),
        sum($"w" * $"n").as("swn"), sum($"w" * $"a").as("swa"),
        sum($"w" * $"w" * $"n").as("sw2n"))
      .select($"nn".as("n"), $"aa".as("a"),
        ($"nn" * $"swa" - $"aa" * $"swn").as("u_num"),
        QueryUtil.halfUp(
          ($"nn" * $"swa" - $"aa" * $"swn").cast("double")
            * ($"nn" * $"swa" - $"aa" * $"swn").cast("double")
            * $"nn".cast("double")
            / ($"aa".cast("double") * ($"nn" - $"aa").cast("double")
              * ($"nn" * $"sw2n" - $"swn" * $"swn").cast("double")), 6).as("z2"),
        (dec($"nn" * $"swa" - $"aa" * $"swn") * dec($"nn" * $"swa" - $"aa" * $"swn")
          * dec($"nn") * lit(CaChi2Den)
          > lit(CaChi2Num) * dec($"aa") * dec($"nn" - $"aa")
            * dec($"nn" * $"sw2n" - $"swn" * $"swn"))
          .cast("long").as("reject_5pct"))
  }

  private val trendTestOracle =
    s"""WITH census AS (
       |  SELECT CAST(l_linenumber AS BIGINT) AS w,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS a
       |  FROM lineitem GROUP BY 1),
       |s AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(a) AS BIGINT) AS aa,
       |             CAST(sum(w * n) AS BIGINT) AS swn,
       |             CAST(sum(w * a) AS BIGINT) AS swa,
       |             CAST(sum(w * w * n) AS BIGINT) AS sw2n
       |      FROM census)
       |SELECT nn AS n, aa AS a,
       |       nn * swa - aa * swn AS u_num,
       |       floor(CAST(nn * swa - aa * swn AS DOUBLE)
       |             * CAST(nn * swa - aa * swn AS DOUBLE)
       |             * CAST(nn AS DOUBLE)
       |             / (CAST(aa AS DOUBLE) * CAST(nn - aa AS DOUBLE)
       |                * CAST(nn * sw2n - swn * swn AS DOUBLE))
       |             * 1000000 + 0.5) / 1000000.0 AS z2,
       |       CAST(CASE WHEN CAST(nn * swa - aa * swn AS HUGEINT)
       |                      * CAST(nn * swa - aa * swn AS HUGEINT)
       |                      * CAST(nn AS HUGEINT) * $CaChi2Den
       |                    > $CaChi2Num * CAST(aa AS HUGEINT)
       |                      * CAST(nn - aa AS HUGEINT)
       |                      * CAST(nn * sw2n - swn * swn AS HUGEINT)
       |                 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- x309

  /** Signature width for the weighted SimHash (x12's width — a 16-bit
    * prototype bucketed so coarsely that sf0.1 emitted 170k verified
    * pairs; 32 bits restores x12-class candidate selectivity). */
  private val WSimBits = 32

  /** x309: IDF-weighted SimHash near-dup candidates — the production
    * refinement of x12's unweighted variant: every token votes on each
    * signature bit with a RARITY weight (w = max(1, 25 − ⌊log₂ df⌋ − 1),
    * halving per doubling of document frequency — the integer-exact
    * stand-in for ⌈idf⌉, computed identically in both engines as
    * `length(bin(df))`, no libm), so boilerplate tokens can no longer
    * flip bits away from the distinguishing content — the classic
    * failure mode of unweighted SimHash on templated corpora. Same
    * bucket-join + exact Jaccard-verify tail as x12 (shared skew cap,
    * same ≥ 0.5 admission on the RAW ratio).
    *
    * Scale: df is one vocabulary aggregate (broadcast dimension); the
    * signature is 16 conditional sums over the exploded distinct-token
    * stream; candidates come from equality buckets — no pairwise stage
    * before the bucket join. */
  def weightedSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", graft.operators.TextAnalysis.tokenSet($"text").as("toks"))
      .localCheckpoint(true)
    val tok = toks.select($"doc_id", explode($"toks").as("t"))
    val dfw = tok.groupBy($"t").agg(count(lit(1)).as("df"))
      .withColumn("w", greatest(lit(1L), lit(25L) - length(bin($"df"))))
    val bitSums = (0 until WSimBits).map { p =>
      val nib = p / 4 + 1
      val shift = 3 - p % 4
      sum(when(expr(
        s"(shiftright(CAST(conv(substring(md5(t), $nib, 1), 16, 10) AS INT), $shift) & 1) = 1"),
        $"w").otherwise(-$"w")).as(s"s$p")
    }
    val sig = tok.join(broadcast(dfw.select($"t", $"w")), "t")
      .groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", concat(
        (0 until WSimBits).map(p => when(col(s"s$p") > 0, "1").otherwise("0")): _*)
        .as("wsim"))
    val base = toks.join(sig, "doc_id")
    val capped = graft.operators.Dedup.capBuckets(base, Seq("wsim"),
      graft.operators.Dedup.DefaultMaxBucket)
    val withN = capped.withColumn("nt", size($"toks"))
    val l = withN.select($"doc_id".as("a"), $"toks".as("ta"), $"wsim", $"nt".as("na"))
    val r = withN.select($"doc_id".as("b"), $"toks".as("tb"), $"wsim", $"nt".as("nb"))
    l.join(r,
        l("wsim") === r("wsim") && $"a" < $"b" &&
          $"na" * 2 >= $"nb" && $"nb" * 2 >= $"na")
      .select($"a", $"b", l("wsim").as("wsim"),
        QueryUtil.fence(graft.operators.Dedup.jaccardSorted($"ta", $"tb")).as("jraw"))
      .filter($"jraw" >= 0.5)
      .select($"a", $"b", $"wsim", QueryUtil.halfUp4($"jraw").as("jaccard"))
      .orderBy("a", "b")
  }

  private val weightedSimhashOracle = {
    val bitExprs = (0 until WSimBits).map { p =>
      val nib = p / 4 + 1
      val shift = 3 - p % 4
      s"""CASE WHEN sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(t), $nib, 1)) - 1) >> $shift) & 1 = 1
         |              THEN w ELSE -w END) > 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" ||\n       ")
    s"""WITH t0 AS (SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS toks
       |            FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS t FROM t0),
       |dfw AS (SELECT t, greatest(1, 25 - length(bin(count(*)))) AS w
       |        FROM tok GROUP BY t),
       |sig AS (SELECT doc_id,
       |       $bitExprs AS wsim
       |      FROM tok JOIN dfw USING (t) GROUP BY doc_id),
       |s0 AS (SELECT t0.doc_id, toks, wsim FROM t0 JOIN sig ON sig.doc_id = t0.doc_id),
       |s AS (SELECT doc_id, toks, wsim
       |      FROM (SELECT *, count(*) OVER (PARTITION BY wsim) AS bn FROM s0)
       |      WHERE bn <= ${graft.operators.Dedup.DefaultMaxBucket}),
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b, x.wsim AS wsim, x.toks AS ta, y.toks AS tb
       |      FROM s x JOIN s y ON x.wsim = y.wsim AND x.doc_id < y.doc_id
       |                        AND len(x.toks) * 2 >= len(y.toks)
       |                        AND len(y.toks) * 2 >= len(x.toks)),
       |j AS (SELECT a, b, wsim,
       |        CAST(len(list_filter(ta, s -> list_contains(tb, s))) AS DOUBLE)
       |              / (len(ta) + len(tb) - len(list_filter(ta, s -> list_contains(tb, s)))) AS jraw
       |      FROM p)
       |SELECT a, b, wsim, floor(jraw * 10000 + 0.5) / 10000.0 AS jaccard FROM j
       |WHERE jraw >= 0.5
       |ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------- defs

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x293_perm_test",
      "exact two-sample permutation test: complete C(12,6) enumeration, integer p-values",
      permTest, Some(permTestOracle)),
    QueryDef("x294_bh_fdr",
      "Benjamini-Hochberg FDR over exact permutation p-values (pure BIGINT step-up rule)",
      bhFdr, Some(bhFdrOracle)),
    QueryDef("x295_recursive_cte",
      "WITH RECURSIVE parity: binary-tree transitive closure, per-depth path-cents census",
      recursiveCte, Some(recursiveCteOracle)),
    QueryDef("x296_hodges_lehmann",
      "Hodges-Lehmann pseudo-median from the value census: pairwise Walsh-average median without n^2 rows",
      hodgesLehmann, Some(hodgesLehmannOracle)),
    QueryDef("x297_margin_bitext",
      "margin-based bitext mining: ratio margin + mutual top-1 agreement over split embeddings",
      marginBitext, Some(marginBitextOracle)),
    QueryDef("x298_pad_vs_pack",
      "padding-vs-packing waste sweep across sequence budgets (exact integer slot accounting)",
      padVsPack, Some(padVsPackOracle)),
    QueryDef("x301_katz_centrality",
      "Katz centrality: unrolled attenuated walk counts in exact scaled integers (third of the x63/x77 family)",
      katzCentrality, Some(katzOracle)),
    QueryDef("x302_contam_span",
      "longest contaminated span per training doc: eval-gram islands merged, max run length",
      contamSpan, Some(contamSpanOracle)),
    QueryDef("x299_tws_mapstate_parity",
      "transformWithState MapState batch parity: per-(user,type) counts as individual store entries over 3 micro-batches",
      twsMapParity, Some(twsMapParityOracle)),
    QueryDef("x300_tws_liststate_parity",
      "transformWithState ListState batch parity: appended purchase log re-derives order-free aggregates",
      twsListParity, Some(twsListParityOracle)),
    QueryDef("x303_stream_token_bucket",
      "token-bucket rate-limiter parity: decision-feedback keyed state vs the identical sequential list_reduce fold",
      tokenBucketParity, Some(tokenBucketParityOracle)),
    QueryDef("x304_percentile_parity",
      "percentile_cont/percentile_disc WITHIN GROUP pinned against quantile_cont/quantile_disc at dyadic p (bit-exact, no rounding)",
      percentileParity, Some(percentileParityOracle)),
    QueryDef("x305_aspect_buckets",
      "aspect-ratio bucketing for image batching: exact cross-multiplied bucket argmin + ppm crop-loss census",
      aspectBuckets, Some(aspectBucketsOracle)),
    QueryDef("x306_tws_warm_start",
      "transformWithState INITIAL-STATE parity: batch-seeded totals + streamed folds equal full-history aggregates",
      twsWarmStartParity, Some(twsWarmStartParityOracle)),
    QueryDef("x307_lsh_band_planner",
      "LSH band planner: exact-rational S-curve x measured pair-similarity histogram ranks (bands, rows) configs",
      lshBandPlanner, Some(lshBandPlannerOracle)),
    QueryDef("x308_trend_test",
      "Cochran-Armitage trend test over ordered categories: exact integer statistic + cross-multiplied decision",
      trendTest, Some(trendTestOracle)),
    QueryDef("x309_weighted_simhash",
      "IDF-weighted SimHash near-dup candidates: rarity-weighted bit votes (integer log2 weights), Jaccard-verified",
      weightedSimhash, Some(weightedSimhashOracle)))
}
