package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fifty-first tier: the Spark-4 VARIANT type (x228) — the
  * new semi-structured column surface (parse once into a binary
  * variant, typed-path extraction in codegen), exercised end-to-end
  * against a JSON-function oracle. */
object Round10Queries51 {

  /** x228: VARIANT extraction — `parse_json(props)` materializes the
    * event payload as a Spark-4 VARIANT (binary-encoded, schema-on-
    * read) and `variant_get(v, '$.k', 'bigint')` pulls the typed field
    * inside whole-stage codegen — the successor to q17's
    * get_json_object string re-parsing (the variant parses ONCE; every
    * extraction after that is a binary walk). The panel per event
    * type: count, Σk, max k, the even-k cohort, and the count of a
    * MISSING path via try_variant_get (null semantics, not an error).
    *
    * Scale: parse+extract is a narrow projection (no shuffle); the
    * variant encodes once per row, so multi-field extraction at 100 TB
    * does not re-tokenize the JSON per field like the string path
    * does. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
          .as("m"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        max($"k").as("max_k"),
        sum(when($"k" % 2 === 0, 1L).otherwise(0L)).as("n_even"),
        sum(when($"m".isNull, 1L).otherwise(0L)).as("n_missing"))
      .orderBy($"event_type")
  }

  private val variantOracle =
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(max(k) AS BIGINT) AS max_k,
      |       CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
      |       CAST(count(*) AS BIGINT) AS n_missing
      |FROM (SELECT event_type,
      |             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x228_variant",
      "Spark-4 VARIANT path: parse_json once, typed variant_get extraction, try_variant_get null semantics on a missing path",
      variantExtract, Some(variantOracle)))
}
