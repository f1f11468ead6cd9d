package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 forty-eighth tier: stylometry — Burrows' Delta between
  * document sources (x225), the authorship-attribution distance that
  * compares z-scored most-frequent-word profiles. */
object Round10Queries48 {

  /** Most-frequent-word profile width. */
  private val DeltaWords = 20

  /** x225: Burrows' Delta — for each source, the per-million rate of
    * the corpus' top-[[DeltaWords]] words; rates are z-scored ACROSS
    * sources per word (exact integer moments, one IEEE sqrt, z
    * quantized to 1e-6 per cell), and Delta(s1,s2) is the mean
    * |z1 − z2| over the profile — one integer div. Published for every
    * source pair, most-similar first: the template-farm detector that
    * works when texts share STYLE but not content (x101's inflation
    * report needs near-identical text; Delta doesn't).
    *
    * Scale: one tokenize+group pass (x40's shape), a vocab-bounded
    * top-M selection, and a |sources|²-row pair frame — the profile
    * matrix is |sources|×M regardless of corpus size. */
  def burrowsDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0)
      .localCheckpoint(true)
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"c".desc, $"tok")))
      .filter($"rk" <= DeltaWords)
      .select($"tok")
    val totals = toks.groupBy($"source").agg(count(lit(1)).as("nt"))
    val cells = toks.join(broadcast(top), "tok")
      .groupBy($"source", $"tok").agg(count(lit(1)).as("cw"))
    // Complete the source × word grid (a source missing a top word has
    // rate 0, not a missing row).
    val grid = totals.crossJoin(broadcast(top))
      .join(cells, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("cw"))
      .select($"source", $"tok", expr("(cw * 1000000) div nt").as("f"))
      .localCheckpoint(true)
    val mom = grid.groupBy($"tok").agg(count(lit(1)).as("ns"),
      sum($"f").as("sf"), sum($"f" * $"f").as("sff"))
    val z = grid.join(broadcast(mom), "tok")
      .select($"source", $"tok",
        expr("CASE WHEN ns * sff - sf * sf > 0 THEN" +
          " CAST(floor((CAST(f AS DOUBLE) - CAST(sf AS DOUBLE)" +
          " / CAST(ns AS DOUBLE))" +
          " / sqrt((CAST(ns AS DOUBLE) * CAST(sff AS DOUBLE)" +
          " - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))" +
          " / (CAST(ns AS DOUBLE) * CAST(ns - 1 AS DOUBLE)))" +
          " * 1000000 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("z_fp"))
      .localCheckpoint(true)
    val pairs = z.toDF("s1", "tok", "z1")
      .join(z.toDF("s2", "tok", "z2"), "tok")
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2")
      .agg(expr("sum(abs(z1 - z2)) div count(1)").as("delta_fp"))
    pairs.withColumn("rk", row_number().over(
      Window.orderBy($"delta_fp", $"s1", $"s2")).cast("long"))
      .select($"rk", $"s1", $"s2", $"delta_fp")
      .orderBy($"rk")
  }

  private val burrowsOracle =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT source, tok FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) t
       |  WHERE length(tok) > 0),
       |top AS MATERIALIZED (
       |  SELECT tok FROM (
       |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
       |    FROM toks GROUP BY tok) t
       |  WHERE rk <= $DeltaWords),
       |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS nt
       |           FROM toks GROUP BY source),
       |cells AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cw
       |          FROM toks JOIN top USING (tok) GROUP BY source, tok),
       |grid AS MATERIALIZED (
       |  SELECT t.source, w.tok,
       |         CAST((COALESCE(c.cw, 0) * 1000000) // t.nt AS BIGINT) AS f
       |  FROM totals t CROSS JOIN top w
       |  LEFT JOIN cells c ON c.source = t.source AND c.tok = w.tok),
       |mom AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS ns, CAST(sum(f) AS BIGINT) AS sf,
       |         CAST(sum(f * f) AS BIGINT) AS sff
       |  FROM grid GROUP BY tok),
       |z AS MATERIALIZED (
       |  SELECT g.source, g.tok,
       |         CASE WHEN m.ns * m.sff - m.sf * m.sf > 0 THEN
       |           CAST(floor((CAST(g.f AS DOUBLE) - CAST(m.sf AS DOUBLE)
       |             / CAST(m.ns AS DOUBLE))
       |             / sqrt((CAST(m.ns AS DOUBLE) * CAST(m.sff AS DOUBLE)
       |             - CAST(m.sf AS DOUBLE) * CAST(m.sf AS DOUBLE))
       |             / (CAST(m.ns AS DOUBLE) * CAST(m.ns - 1 AS DOUBLE)))
       |             * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS z_fp
       |  FROM grid g JOIN mom m ON m.tok = g.tok),
       |pairs AS (
       |  SELECT a.source AS s1, b.source AS s2,
       |         CAST(sum(abs(a.z_fp - b.z_fp)) // count(*) AS BIGINT) AS delta_fp
       |  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT rk, s1, s2, delta_fp FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY delta_fp, s1, s2) AS BIGINT)
       |           AS rk, s1, s2, delta_fp
       |  FROM pairs) t
       |ORDER BY rk""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x225_burrows_delta",
      "Burrows' Delta stylometry between sources: z-scored top-20 word rates, mean |z| distance per source pair, most-similar first",
      burrowsDelta, Some(burrowsOracle)))
}
