package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-10 thirty-eighth tier: the Spark-4 `transformWithState`
  * arbitrary-state API, batch-parity-gated (x207) — the successor
  * surface to the `mapGroupsWithState` family already covered by
  * x117/x145/x148/x150/x151. */
object Round10Queries38 {

  /** Micro-batch slice cuts (seconds since epoch over the fixture's
    * January window) — three files ⇒ state must survive two
    * micro-batch boundaries. */
  private val SliceCuts = Seq(1704800000L, 1705800000L)

  /** x207: `transformWithState` batch parity — per-user running
    * purchase totals (count, cents, max) held in a typed `ValueState`
    * by [[graft.streaming.IncrementalStream.TwsTotalsProcessor]],
    * streamed over three chronological file slices with
    * maxFilesPerTrigger=1 so the RocksDB-backed state genuinely
    * crosses micro-batch boundaries. The stream emits an updated row
    * per touched key per batch; the LAST emission per user (the one
    * with the maximal running count) must equal the classic batch
    * aggregate — the same chain-of-evidence shape as
    * x117_stream_topk_parity, now on the new API.
    *
    * Scale: state is O(users)×3 longs on a RocksDB store partitioned
    * by the stream shuffle; each micro-batch shuffles only its own
    * rows. The conf window pins the RocksDB provider (the only one
    * the operator supports) and restores the session default after. */
  def twsParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_x207").toString
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        expr("unix_timestamp(cast(date_trunc('second', ts) as timestamp))")
          .cast("long").as("sec"),
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      .localCheckpoint(true) // r16: one scan for all staged slices
    val bounds = (Long.MinValue +: SliceCuts) zip (SliceCuts :+ Long.MaxValue)
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      purchases.filter($"sec" >= lo && $"sec" < hi)
        .coalesce(1).write.parquet(s"$base/src/s$i")
      val part = new java.io.File(s"$base/src/s$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.FileSystems.getDefault
        .getPath(s"$base/src/f$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream.schema(purchases.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val totals = graft.streaming.IncrementalStream.twsUserTotals(
      stream.select($"user_id", $"cents").as[(Long, Long)])
    // Executor-side parquet staging (no driver buffer) + full temp-tree
    // cleanup once the emissions are checkpointed (r10 verdict/advice).
    val emitted = QueryUtil.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8") {
      QueryUtil.stageStream(spark, totals.toDF(), base)
    }
    QueryUtil.deleteRecursively(base)
    // Last emission per user = the row with the maximal running count
    // (counts only grow; ties impossible within a key).
    emitted.groupBy($"user_id")
      .agg(max(struct($"n_purch", $"cents", $"max_cents")).as("s"),
        count(lit(1)).as("n_emits"))
      .select($"user_id", $"s.n_purch".as("n_purch"), $"s.cents".as("cents"),
        $"s.max_cents".as("max_cents"))
      .orderBy($"user_id")
  }

  private val twsParityOracle =
    """SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n_purch,
      |       CAST(sum(cents) AS BIGINT) AS cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM (SELECT user_id,
      |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |      FROM events WHERE event_type = 'purchase') p
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("x207_tws_parity",
      "transformWithState (Spark-4 arbitrary-state API) batch parity: ValueState running purchase totals over 3 real micro-batches on RocksDB",
      twsParity, Some(twsParityOracle),
      // r15 verdict #5: the ValueState-across-micro-batches contract is
      // exercised by four still-timed TWS ValueState queries (x303 token
      // bucket, x349 Page-Hinkley, x375 SPRT, x306 warm start) on the
      // same RocksDB provider path — Verify-gated, not re-timed.
      benchSkip = true))
}
