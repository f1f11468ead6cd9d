package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for hot-key aggregation at scale.
  *
  * At 100 TB a handful of degenerate keys (one user with 10⁹ events, one
  * duplicate document with 10⁶ copies) turn a single reducer into the
  * stage's critical path. Salting splits each key across `salts` partial
  * groups, aggregates the partials map-side-style, then combines — two
  * small shuffles instead of one skewed one. AQE's skew-join handling
  * covers joins; this covers aggregations, which AQE does not re-balance.
  */
object Skew {

  /** Deterministic salt: stable hash of `row`'s distributor column modulo
    * `salts` (deterministic so re-runs produce identical partials —
    * rand() would break retry idempotence mid-stage). */
  def salt(distributor: Column, salts: Int): Column =
    pmod(xxhash64(distributor), lit(salts.toLong)).cast("int")

  /** Salted sum/count aggregation: groupBy(key).agg(sum(value), count(*))
    * computed as partial-on-(key,salt) → final-on-key. Result-identical to
    * the unsalted aggregate for these associative aggregates (spec-proven);
    * longs are exact, and double sums differ only in association order (the
    * same caveat partial aggregation already has). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     distributor: String, salts: Int): DataFrame =
    df.withColumn("__salt", salt(col(distributor), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
}
