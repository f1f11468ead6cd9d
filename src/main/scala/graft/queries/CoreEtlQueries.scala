package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Etl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Queries covering the reference's core pipeline semantics (SURVEY.md §2:
  * P1 projection, F1/F2 string clean, F4 content hash, D1 dedup, SNK1
  * idempotent merge, S1 overlap-then-dedup incremental, T6 bulk-vs-append)
  * expressed as batch queries over the `events` fixture (the stand-in for the
  * reference's lead-activity feed). */
object CoreEtlQueries {

  /** The reference ETL as one declarative plan: project/clean/hash → dedup →
    * stable order. This is also `SparkEntry.entry`'s flagship. */
  def etlLeadActivity(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val projected = Tables.events(spark, dir).select(
      $"event_id",
      $"user_id",
      Etl.cleanEventName($"event_type").as("event_name"),
      $"ts".as("event_date"),
      Etl.contentHash($"event_id", $"user_id", $"event_type", $"props").as("hash"))
    Etl.dedupByHash(projected, "hash", Seq("event_id")).orderBy("hash")
  }

  private val etlOracle =
    """WITH proj AS (
      |  SELECT event_id, user_id,
      |         substr(split_part(event_type, '?', 1), 1, 256) AS event_name,
      |         ts AS event_date,
      |         substr(md5(concat_ws('|',
      |             coalesce(CAST(event_id AS VARCHAR), ''),
      |             coalesce(CAST(user_id AS VARCHAR), ''),
      |             coalesce(event_type, ''),
      |             coalesce(props, ''))), 1, 16) AS hash
      |  FROM events)
      |SELECT event_id, user_id, event_name, event_date, hash
      |FROM (SELECT *, row_number() OVER (PARTITION BY hash ORDER BY event_id) AS rn FROM proj)
      |WHERE rn = 1
      |ORDER BY hash""".stripMargin

  /** S1+SNK1+D1: incremental merge with boundary overlap. "Existing" sink =
    * first 60% of events by id; "incoming" batch = last 50% (overlapping
    * 10%) — the overlap is swallowed by the anti-join exactly like the
    * reference's re-fetched boundary page is swallowed by the DB unique key
    * (salesforce_extractor.py:264,:213-217,:389). */
  def incrementalMerge(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val hashed = Tables.events(spark, dir).select(
      $"event_id", $"user_id", $"event_type",
      Etl.contentHash($"event_id", $"user_id", $"event_type", $"props").as("hash"))
    val n = 10000L // cut points only need to be deterministic, not exact fractions
    val existing = hashed.filter($"event_id" < n * 6 / 10)
    val incoming = hashed.filter($"event_id" >= n * 5 / 10)
    Etl.mergeIncremental(existing, incoming, "hash")
      .select($"event_id", $"user_id", $"event_type", $"hash")
      .orderBy("event_id")
  }

  private val mergeOracle =
    """WITH hashed AS (
      |  SELECT event_id, user_id, event_type,
      |         substr(md5(concat_ws('|',
      |             coalesce(CAST(event_id AS VARCHAR), ''),
      |             coalesce(CAST(user_id AS VARCHAR), ''),
      |             coalesce(event_type, ''),
      |             coalesce(props, ''))), 1, 16) AS hash
      |  FROM events),
      |existing AS (SELECT * FROM hashed WHERE event_id < 6000),
      |incoming AS (SELECT * FROM hashed WHERE event_id >= 5000)
      |SELECT event_id, user_id, event_type, hash FROM existing
      |UNION ALL
      |SELECT event_id, user_id, event_type, hash FROM incoming i
      |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.hash = i.hash)
      |ORDER BY event_id""".stripMargin

  /** F3: null-on-failure 12-hour-clock date parse (salesforce_extractor.py
    * :138-151) exercised by rendering `ts` into the reference's wire format
    * and parsing it back; rows whose rendered form is corrupted (every 7th)
    * must yield NULL, not an error. */
  def dateParse(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(
        $"event_id",
        when($"event_id" % 7 === 0, lit("not a date"))
          .otherwise(date_format($"ts", "M/d/yyyy h:mm:ss a")).as("raw"))
      .select($"event_id", $"raw", Etl.parseSfmcDate($"raw").as("parsed"))
      .orderBy("event_id")
  }

  private val dateParseOracle =
    """WITH raw AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 7 = 0 THEN 'not a date'
      |              ELSE strftime(ts, '%-m/%-d/%Y %-I:%M:%S %p') END AS raw
      |  FROM events)
      |SELECT event_id, raw, try_strptime(raw, '%m/%d/%Y %I:%M:%S %p') AS parsed
      |FROM raw
      |ORDER BY event_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q00_etl_lead_activity",
      "Reference core pipeline P1+F1+F2+F4+D1 as one declarative plan over events",
      etlLeadActivity, Some(etlOracle)),
    QueryDef("q0a_incremental_merge",
      "S1+SNK1: overlap-then-dedup incremental merge (bulk/append equivalence)",
      incrementalMerge, Some(mergeOracle)),
    QueryDef("q0b_date_parse",
      "F3: 12h-clock parse with null-on-failure (ANSI-safe try_to_timestamp)",
      dateParse, Some(dateParseOracle)))
}
