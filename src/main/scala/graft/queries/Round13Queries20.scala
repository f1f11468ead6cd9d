package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 twentieth tier: space-filling-curve layout comparison
  * (Hilbert vs Z-order scan locality — the decision q81's z-order layout
  * left open) and Somers' D (the ASYMMETRIC ordinal-association measure —
  * credit scoring's accuracy-ratio — computed entirely from the 2-D
  * value census, no row-pair join).
  */
object Round13Queries20 {

  /** Grid order: 16×16 cells (4 bits per axis, 4 unrolled Hilbert
    * rotation steps). */
  private val GridN = 16L

  /** The literal query rectangles the locality audit scans
    * (lo_x, hi_x, lo_y, hi_y — inclusive). */
  private val Rects = Seq(
    ("r1_corner", 0L, 3L, 0L, 3L),
    ("r2_mid", 6L, 9L, 2L, 5L),
    ("r3_wide", 12L, 15L, 0L, 15L))

  /** The 4-step Hilbert xy→d transform for a 16×16 grid as ONE SQL
    * expression chain (s = 8,4,2,1 unrolled; the same text runs in Spark
    * and DuckDB — only `&`, CASE and arithmetic). Input column names are
    * substituted so the chain can start from any (x, y) pair. */
  private[graft] def hilbertSqlSteps(xc: String, yc: String): Seq[String] = {
    // step i: given (x{i}, y{i}, d{i}) produce (x(i+1), y(i+1), d(i+1))
    Seq(8L, 4L, 2L, 1L).zipWithIndex.flatMap { case (s, i) =>
      val (x0, y0, d0) =
        if (i == 0) (xc, yc, "CAST(0 AS BIGINT)")
        else (s"hx$i", s"hy$i", s"hd$i")
      val j = i + 1
      Seq(
        s"CASE WHEN ($x0 & $s) > 0 THEN 1 ELSE 0 END AS rx$j",
        s"CASE WHEN ($y0 & $s) > 0 THEN 1 ELSE 0 END AS ry$j") ++ Seq(
        // d += s²·((3·rx) xor ry) — spelled as a CASE so no xor builtin
        // is needed (DuckDB xor() and Spark ^ differ in spelling)
        s"$d0 + ${s * s} * (CASE WHEN rx$j = 0 AND ry$j = 0 THEN 0 " +
          s"WHEN rx$j = 0 THEN 1 WHEN ry$j = 1 THEN 2 ELSE 3 END) AS hd$j",
        // rotate: ry=0 → (maybe flip) then swap x/y
        s"CASE WHEN ry$j = 0 THEN (CASE WHEN rx$j = 1 THEN ${s - 1} - $y0 ELSE $y0 END) " +
          s"ELSE $x0 END AS hx$j",
        s"CASE WHEN ry$j = 0 THEN (CASE WHEN rx$j = 1 THEN ${s - 1} - $x0 ELSE $x0 END) " +
          s"ELSE $y0 END AS hy$j")
    }
  }

  /** Bit-interleave Z-order index for 4-bit axes, same text both engines. */
  private[graft] def zorderSql(xc: String, yc: String): String =
    (0 until 4).map { b =>
      val m = 1L << b
      s"(CASE WHEN ($xc & $m) > 0 THEN ${1L << (2 * b)} ELSE 0 END + " +
        s"CASE WHEN ($yc & $m) > 0 THEN ${1L << (2 * b + 1)} ELSE 0 END)"
    }.mkString(" + ")

  // ---------------------------------------------------------------- x353

  /** x353: Hilbert vs Z-order scan locality. The order-grain trade grid
    * (custkey mod 16 × suppkey mod 16, non-empty cells only) is indexed
    * by BOTH curves — the Hilbert transform unrolled as four integer
    * rotation steps, the Z-order index as a bit interleave, identical
    * SQL text in both engines. For each literal query rectangle and each
    * curve: the covered cell count, the scan SPAN (max−min+1 positions)
    * and the FRAGMENT count (maximal runs of consecutive positions —
    * the number of disjoint range reads a clustered table needs).
    * Hilbert's whole point is fewer fragments on axis-aligned
    * rectangles; the output makes the comparison an oracle-checked fact
    * rather than folklore.
    *
    * Scale: one map-side-combinable grid census (≤ 256 cells) off the
    * orders⋈customer⋈lineitem join; the curve algebra never touches the
    * corpus again. */
  def hilbertLocality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" % GridN).cast("long").as("cx"),
        ($"l_suppkey" % GridN).cast("long").as("cy"))
      .distinct()
    val hSteps = hilbertSqlSteps("cx", "cy")
    val indexed = hSteps.foldLeft(cells.as("c").toDF()) { (df, stepSql) =>
      df.selectExpr("*", stepSql)
    }.selectExpr("cx", "cy", "hd4 AS hidx", s"${zorderSql("cx", "cy")} AS zidx")
    val rects = Rects.toDF("rect", "lox", "hix", "loy", "hiy")
    val inRect = indexed.crossJoin(broadcast(rects))
      .filter($"cx" >= $"lox" && $"cx" <= $"hix" && $"cy" >= $"loy" && $"cy" <= $"hiy")
    val melted = inRect.select($"rect", lit("hilbert").as("curve"), $"hidx".as("idx"))
      .unionByName(inRect.select($"rect", lit("zorder").as("curve"), $"zidx".as("idx")))
    val w = Window.partitionBy($"rect", $"curve").orderBy($"idx")
    melted
      .withColumn("brk", when(lag($"idx", 1).over(w).isNull ||
        lag($"idx", 1).over(w) =!= $"idx" - 1L, 1L).otherwise(0L))
      .groupBy($"rect", $"curve")
      .agg(count(lit(1)).as("n_cells"),
        (max($"idx") - min($"idx") + 1L).as("span"),
        sum($"brk").as("frags"))
      .orderBy($"rect", $"curve")
  }

  private val hilbertLocalityOracle = {
    val hSteps = hilbertSqlSteps("cx", "cy")
    // chain the step expressions through nested selects
    val chained = hSteps.grouped(5).zipWithIndex.foldLeft("SELECT cx, cy FROM cells") {
      case (inner, (stepExprs, _)) =>
        s"SELECT *, ${stepExprs.mkString(", ")} FROM ($inner)"
    }
    val rectRows = Rects.map { case (nm, lx, hx, ly, hy) =>
      s"('$nm', $lx, $hx, $ly, $hy)"
    }.mkString(", ")
    s"""WITH cells AS MATERIALIZED (
       |  SELECT CAST(o_custkey % $GridN AS BIGINT) AS cx,
       |         CAST(l_suppkey % $GridN AS BIGINT) AS cy
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |indexed AS (
       |  SELECT cx, cy, hd4 AS hidx, ${zorderSql("cx", "cy")} AS zidx
       |  FROM ($chained)),
       |rects AS (SELECT * FROM (VALUES $rectRows) r(rect, lox, hix, loy, hiy)),
       |in_rect AS (
       |  SELECT rect, cx, cy, hidx, zidx
       |  FROM indexed CROSS JOIN rects
       |  WHERE cx >= lox AND cx <= hix AND cy >= loy AND cy <= hiy),
       |melted AS (
       |  SELECT rect, 'hilbert' AS curve, hidx AS idx FROM in_rect
       |  UNION ALL
       |  SELECT rect, 'zorder' AS curve, zidx AS idx FROM in_rect),
       |marked AS (
       |  SELECT rect, curve, idx,
       |         CASE WHEN lag(idx) OVER (PARTITION BY rect, curve ORDER BY idx)
       |                   IS DISTINCT FROM idx - 1 THEN 1 ELSE 0 END AS brk
       |  FROM melted)
       |SELECT rect, curve, CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(max(idx) - min(idx) + 1 AS BIGINT) AS span,
       |       CAST(sum(brk) AS BIGINT) AS frags
       |FROM marked GROUP BY 1, 2
       |ORDER BY rect, curve""".stripMargin
  }

  // ---------------------------------------------------------------- x354

  /** x354: Somers' D — does the discount LEVEL (ordinal X, cents) predict
    * the quantity (ordinal Y)? D_yx = (C − D)/(C + D + T_Y): concordant,
    * discordant and tied-on-Y-only pair counts, ALL computed from the
    * (discount, quantity) 2-D census — the pair "join" is census², a few
    * hundred cells, never row pairs (the same trick as x325's energy
    * statistic). Exact BIGINT counts; the ratio is one double division
    * plus halfUp4. The asymmetric denominator (penalizing only Y-ties)
    * is what distinguishes D from x234's tau-a and x322's Cliff delta.
    *
    * Scale: one map-side-combinable groupBy census; the cell-pair join
    * is |X domain|·|Y domain| squared — constants. */
  def somersD(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.lineitem(spark, dir)
      .select(floor($"l_discount" * 100 + 0.5).cast("long").as("x"),
        $"l_quantity".cast("long").as("y"))
      .groupBy($"x", $"y").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val pairs = cells.toDF("x1", "y1", "n1")
      .crossJoin(cells.toDF("x2", "y2", "n2"))
    // every predicate uses x1 < x2, so each unordered pair is counted
    // exactly ONCE — the first cut used the symmetric x1 <> x2 for the
    // Y-tie term, double-counting T_Y against single-counted C/D and
    // deflating D toward (C−D)/(C+D+2T_Y); caught by the r13 review
    val agg = pairs.agg(
      sum(when($"x1" < $"x2" && $"y1" < $"y2", $"n1" * $"n2").otherwise(0L)).as("nc"),
      sum(when($"x1" < $"x2" && $"y1" > $"y2", $"n1" * $"n2").otherwise(0L)).as("nd"),
      sum(when($"x1" < $"x2" && $"y1" === $"y2", $"n1" * $"n2").otherwise(0L)).as("ty"))
    agg.select($"nc", $"nd", $"ty",
      QueryUtil.halfUp4(($"nc" - $"nd").cast("double") /
        ($"nc" + $"nd" + $"ty").cast("double")).as("somers_d"))
  }

  private val somersDOracle =
    """WITH cells AS MATERIALIZED (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
      |         CAST(l_quantity AS BIGINT) AS y,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |agg AS (
      |  SELECT
      |    CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS nd,
      |    CAST(sum(CASE WHEN a.x < b.x AND a.y = b.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS ty
      |  FROM cells a CROSS JOIN cells b)
      |SELECT nc, nd, ty,
      |       floor((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
      |             / (CAST(nc AS DOUBLE) + CAST(nd AS DOUBLE) + CAST(ty AS DOUBLE))
      |             * 10000 + 0.5) / 10000.0 AS somers_d
      |FROM agg""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x353_hilbert_locality",
      "Hilbert vs Z-order scan locality on the trade grid: unrolled integer curve transforms, span + fragment censuses per rectangle",
      hilbertLocality, Some(hilbertLocalityOracle)),
    QueryDef("x354_somers_d",
      "Somers' D of discount level predicting quantity: asymmetric concordance from the 2-D census, no row-pair join",
      somersD, Some(somersDOracle)))
}
