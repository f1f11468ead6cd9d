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
    *              right row exists). */
  def joinPrior(left: DataFrame, right: DataFrame, key: String, leftTs: String,
                rightTs: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(right.schema(rightTs).dataType))
    val lWithNullPayload = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))
    val rBase = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumn("__rts", col(rightTs))
    val r = payload.foldLeft(rBase)((df, p) => df.withColumn(s"__p_$p", col(p)))
      .select((key +: "__ts" +: "__tag" +: "__rts" +: payload.map(p => s"__p_$p")).map(col): _*)
    // left keeps all its columns; right contributes only key/ts/payload
    val lSel = lWithNullPayload.select(
      (lCols.toSeq ++ Seq("__ts", "__tag", "__rts") ++ payload.map(p => s"__p_$p")).map(col): _*)
    val unioned = lSel.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
    val withPayload = payload.foldLeft(carried)((df, p) =>
      df.withColumn(s"asof_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w)))
    withPayload
      .filter(col("__tag") === 1)
      .withColumnRenamed("__asof_ts", "asof_ts")
      .drop("__ts", "__tag", "__rts")
      .drop(payload.map(p => s"__p_$p"): _*)
  }
}
