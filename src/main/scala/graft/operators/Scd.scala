package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance (q47's semantics as reusable
  * operators): build a history-preserving dimension from an event stream,
  * and — the production shape — APPLY an append-only batch to an existing
  * dimension without rebuilding it (incremental view maintenance; the
  * reference only ever appends latest state, `salesforce_extractor.py
  * :373-394`).
  *
  * Dimension schema: (user_id, version, event_type, valid_from, valid_to,
  * is_current); event schema: (user_id, ts, event_id, event_type).
  * PropertySpec proves `scd2Apply(scd2Build(h1), h2) == scd2Build(h1 ∪ h2)`
  * for any time-boundary split, including batches introducing brand-new
  * users and batches that produce no new versions.
  */
object Scd {

  /** Full rebuild: collapse consecutive identical `event_type` values per
    * user into versioned [valid_from, valid_to) rows. One hash shuffle on
    * user_id shared by both windows; the change-filter drops the
    * (dominant) unchanged rows between them. */
  def scd2Build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Incremental apply: merge an APPEND-ONLY batch (per user, every batch
    * ts ≥ that user's current valid_from — a global time-boundary split
    * satisfies this) into an existing dimension. Untouched users' rows
    * pass through without recompute; affected users re-derive only from
    * their single current row (as a seed pseudo-event sorted before any
    * batch event) plus the batch — closed historical versions are never
    * read, so the work scales with the BATCH, not the dimension.
    *
    * Scale: one semi/anti join pair against the (small) affected-user
    * set, then q47's window over seed+batch rows only. */
  def scd2Apply(dim: DataFrame, batch: DataFrame): DataFrame = {
    val affected = batch.select(col("user_id")).distinct()
    // current row -> seed pseudo-event; event_id Long.MinValue sorts it
    // before any real event at the same timestamp, and v0 carries the
    // version counter forward.
    val seed = dim.filter(col("is_current"))
      .join(affected, "user_id")
      .select(col("user_id"), col("valid_from").as("ts"),
        lit(Long.MinValue).as("event_id"), col("event_type"),
        col("version").as("v0"))
    val ev = batch.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), lit(null).cast(seed.schema("v0").dataType).as("v0"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rebuilt = seed.unionByName(ev)
      .withColumn("v0u", max(col("v0")).over(wAll)) // null for brand-new users
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("rn", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"),
        (coalesce(col("v0u"), lit(1)) - 1 + col("rn")).as("version"),
        col("event_type"), col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
    val untouched = dim.join(affected, Seq("user_id"), "left_anti")
    val history = dim.join(affected, Seq("user_id"), "left_semi")
      .filter(!col("is_current"))
    untouched.unionByName(history).unionByName(rebuilt)
  }
}
