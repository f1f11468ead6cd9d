package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each left row, attach the latest right row with
  * `rightTs < leftTs` (strict) within the same key — the operator behind
  * point-in-time lookups (latest quote before a trade, last profile before
  * an event).
  *
  * Spark has no native as-of join; the naive `l.ts > r.ts` theta-join
  * explodes to O(|L|·|R|) per key. This implementation is the scalable
  * union + carry-forward form:
  *
  *   1. tag left (1) and right (0) rows, union them;
  *   2. one window per key ordered by (ts, tag DESC) — at equal timestamps
  *      the LEFT row sorts first, so a strictly-equal right row is not yet
  *      visible (strict semantics);
  *   3. `last(payload, ignoreNulls)` carry-forward gives every left row the
  *      most recent preceding right payload;
  *   4. keep the left rows.
  *
  * One shuffle on the key, O(|L|+|R|) rows — survives any scale the window
  * itself survives. Right side must be unique per (key, ts) (pre-aggregate
  * otherwise) so the match is deterministic.
  */
object AsOf {

  /** @param right unique per (key, ts); its `payload` columns are attached
    *              to each left row as `asof_<name>` (null when no earlier
    *              right row exists). The match timestamp and payload are
    *              carried together in ONE struct, non-null exactly when the
    *              row IS a right row — so `last(ignoreNulls)` can never mix
    *              the timestamp of one right row with the payload of an
    *              older one, even when a payload value is legitimately
    *              NULL. */
  def joinPrior(left: DataFrame, right: DataFrame, key: String, leftTs: String,
                rightTs: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select((lCols.toSeq ++ Seq("__ts", "__tag")).map(col): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumn("__r", struct(col(rightTs).as("__match_ts") +: payload.map(col): _*))
      .select(col(key), col("__ts"), col("__tag"), col("__r"))
    // unionByName fills the left side's missing __r with a NULL struct —
    // exactly the presence marker the carry-forward keys on.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(
      carried.withColumn("asof_ts", col("__last.__match_ts")))((df, p) =>
      df.withColumn(s"asof_$p", col(s"__last.$p")))
    unpacked
      .filter(col("__tag") === 1)
      .drop("__ts", "__tag", "__r", "__last")
  }
}
