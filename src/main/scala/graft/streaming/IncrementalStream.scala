package graft.streaming

import graft.operators.Etl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming re-expression of the reference's incremental mode
  * (SURVEY.md §2 rows S1–S3): the reference simulates streaming with Python
  * generators + offset CDC + DB-unique-key dedup; here the same semantics
  * are file-source micro-batches with `Trigger.AvailableNow` and an
  * idempotent per-batch merge (append only hashes not already in the sink).
  *
  * Scale: `foreachBatch` materializes the existing key set per micro-batch —
  * fine while the sink's distinct-hash set broadcasts; at 100 TB the sink
  * would be bucketed by hash and the anti-join stays shuffle-free on the
  * batch side.
  */
object IncrementalStream {

  /** Per-user running aggregate carried as explicit state. */
  final case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * (count, sum) that survives across micro-batches through the
    * checkpoint — the Structured Streaming surface for state machines the
    * built-in windowed aggregations can't express. NoTimeout here; an
    * event-time timeout + watermark turns the same shape into expiring
    * sessions. */
  def runningUserStats(events: org.apache.spark.sql.Dataset[(Long, Double)]):
      org.apache.spark.sql.Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserStats(uid, prev.n_events + batch.size,
            prev.sum_value + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }

  /** One packed document emitted by [[packStream]]. */
  final case class PackedDoc(doc_id: Long, shard: Long, n_tok: Int,
                             cum_before: Long, seq_id: Long, seq_off: Long)

  /** Streaming sequence packing — x50's concat-then-chunk layout maintained
    * INCREMENTALLY: each shard's running token total lives in keyed state,
    * so documents arriving across micro-batches receive the same
    * (seq_id, seq_off) the batch packer would assign once the corpus is
    * complete — the training-sequence layout stays consistent while
    * ingestion is still running, no re-pack of old data. Within a batch a
    * shard's docs pack in doc_id order (deterministic); across batches the
    * arrival order IS the pack order, which equals the batch packer's
    * whenever the upstream source delivers id-ordered increments (exactly
    * what the offset-CDC connector produces). State is one Long per shard —
    * bounded by the shard count, not the corpus. */
  def packStream(docs: org.apache.spark.sql.Dataset[(Long, Long, Int)],
                 budget: Long): org.apache.spark.sql.Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackedDoc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, n) =>
            val before = cum
            cum += n
            PackedDoc(id, shard, n, before, before / budget, before % budget)
          }
          state.update(cum)
          out.iterator
      }
  }

  /** One SCD2 version OPENING: user's attribute changed to `event_type`
    * at `valid_from_sec`, becoming version `version`. Closings are implied
    * (version v closes when v+1 opens) — Append output mode cannot
    * retro-emit a close, and the downstream dim derives valid_to with
    * q47's lead window (or [[graft.operators.Scd.scd2Apply]]). */
  final case class Scd2Open(user_id: Long, version: Int,
                            event_type: String, valid_from_sec: Long)

  /** Streaming SCD Type-2 maintenance — q47/Scd semantics kept
    * incrementally: keyed state per user holds (current attribute,
    * current version), each micro-batch's events are ordered by
    * (sec, event_id) and every attribute CHANGE emits a version opening
    * in the batch it arrives. Equals the batch [[graft.operators.Scd
    * .scd2Build]] whenever the upstream delivers per-user time-ordered
    * increments across batches (the offset-CDC / append-only source
    * assumption packStream also makes; StreamingSpec proves the parity
    * over checkpointed multi-drain runs). State: one (String, Int) per
    * user — bounded by the user population, independent of stream
    * length. Per-batch memory: the user's slice of one micro-batch (the
    * in-batch sort needs it; same bound as nearDupGate). */
  def scd2Stream(events: org.apache.spark.sql.Dataset[(Long, Long, Long, String)]):
      org.apache.spark.sql.Dataset[Scd2Open] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(String, Int), Scd2Open](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (user, rows, state) =>
          var (lastType, lastVer) = state.getOption.getOrElse((null: String, 0))
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).flatMap {
            case (_, sec, _, t) =>
              if (t != lastType) {
                lastVer += 1; lastType = t
                Some(Scd2Open(user, lastVer, t, sec))
              } else None
          }
          if (lastVer > 0) state.update((lastType, lastVer))
          out.iterator
      }
  }

  /** One gate verdict: whether the doc is the bucket's canonical or a
    * near-duplicate of it. */
  final case class DedupVerdict(doc_id: Long, bucket: Long,
                                is_first: Boolean, canonical: Long)

  /** Streaming near-dup gate — x12's SimHash bucketing maintained
    * incrementally: keyed state per simhash bucket holds the first-seen
    * doc_id (the canonical), and every arriving doc is flagged
    * first-or-duplicate in the micro-batch it arrives, so corpus intake
    * can drop near-dups while ingestion is still running instead of
    * re-running batch dedup per load. Within a batch ties resolve by min
    * doc_id; across batches arrival order wins — which equals the batch
    * survivor rule (global min id) whenever the upstream delivers
    * id-ordered increments, exactly what the offset-CDC connector
    * produces. A replay of the canonical itself (the connector's
    * boundary-page overlap) re-flags as is_first — idempotent, no state
    * change. State: one Long per DISTINCT bucket (bounded by the bucket
    * space, not the corpus). Per-batch memory: O(1) once a bucket has a
    * canonical — the warm path is a pure streaming map over the one-shot
    * iterator, no buffering at all, so a hot bucket costs nothing beyond
    * the rows flowing through. Only a bucket's FIRST-EVER batch buffers
    * (ids only, one Long per row): the batch-min canonical must be known
    * before the first verdict is emitted, and the iterator can't be
    * replayed. That cold-path bound is one bucket's slice of one
    * micro-batch, paid once per bucket lifetime. Callers compute `bucket`
    * with `Dedup.simhashBits` (the same expression works in a streaming
    * select), so batch and streaming gates share one bucketing. */
  def nearDupGate(docs: org.apache.spark.sql.Dataset[(Long, Long)]):
      org.apache.spark.sql.Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (bucket, rows, state) =>
          state.getOption match {
            case Some(canon) =>
              // Warm path: canonical is known — single streaming pass,
              // zero buffering, O(1) memory however hot the bucket is.
              rows.map { case (id, _) =>
                DedupVerdict(id, bucket, is_first = id == canon, canon)
              }
            case None =>
              // Cold path (first batch for this bucket): min-tracking pass
              // buffering ids only, then lazy emission from the buffer.
              val ids = rows.map(_._1).toArray
              if (ids.isEmpty) Iterator.empty
              else {
                val canon = ids.min
                state.update(canon)
                ids.iterator.map(id =>
                  DedupVerdict(id, bucket, is_first = id == canon, canon))
              }
          }
      }
  }

  /** One maintained top-k entry: the group's standings as of its `ver`-th
    * batch (max ver per group = the current view). */
  final case class TopkEntry(grp: String, ver: Int, rk: Int, id: Long, v: Long)

  /** Streaming top-k view maintenance — the q89 identity under
    * micro-batching: per group, state holds the current top-k
    * (value desc, id asc tie-break) and each batch folds its rows into
    * that bounded buffer one element at a time (insertion into a k-sized
    * array — O(k) memory per group however hot the batch, the nearDupGate
    * memory contract). Emits the group's full standings after every batch
    * it appears in; the latest emission per group equals the batch top-k
    * over everything seen — topk(topk(A) ∪ Δ) = topk(A ∪ Δ), the same
    * identity q89's oracle proves, re-proven per micro-batch split by
    * StreamingSpec. */
  def topkStream(rows: org.apache.spark.sql.Dataset[(String, Long, Long)],
                 k: Int = 5):
      org.apache.spark.sql.Dataset[TopkEntry] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Array[(Long, Long)]), TopkEntry](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (grp, batch, state) =>
          // Order: value desc, id asc — a pair (v, id) wins if its v is
          // larger, or equal v with smaller id.
          def beats(a: (Long, Long), b: (Long, Long)): Boolean =
            a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
          val (ver0, top0) = state.getOption.getOrElse((0, Array.empty[(Long, Long)]))
          var top = top0
          batch.foreach { case (_, id, v) =>
            val e = (id, v)
            if (top.length < k || beats(e, top.last))
              top = (top :+ e).sortWith(beats).take(k)
          }
          val ver = ver0 + 1
          state.update((ver, top))
          top.iterator.zipWithIndex.map { case ((id, v), i) =>
            TopkEntry(grp, ver, i + 1, id, v)
          }
      }
  }

  /** One decayed-score emission: the x67 score for (grp, dayn) as of the
    * latest batch that touched that day. */
  final case class DecayScore(grp: String, dayn: Int, decayed_fp: Long)

  /** Streaming maintenance of x67's exponentially time-decayed counts —
    * the trending/freshness score kept warm per key instead of recomputed
    * over the 30-day window each run. State per group: the trailing
    * 30-day (day → count) panel (≤ 30 entries of (Int, Long) — bounded
    * however hot the key), merged with each batch's per-day counts; a
    * batch emits, for every day it touches, the EXACT x67 fixed-point
    * score Σ_{d ∈ (D−30, D]} cnt_d · 2^(30−(D−d)) recomputed from the
    * panel — not the halve-and-add recurrence, whose per-step integer
    * truncation drifts from the windowed sum (the reason the state is
    * the panel, not one accumulator). Contract (the reference's
    * append-only CDC assumption): batches never contain a day EARLIER
    * than the state's max day — same-day continuation is fine and
    * re-emits that day; the latest emission per (grp, day) then equals
    * the batch x67 row, proven per micro-batch split by StreamingSpec. */
  def decayStream(rows: org.apache.spark.sql.Dataset[(String, Int)],
                  windowDays: Int = 30):
      org.apache.spark.sql.Dataset[DecayScore] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Int, Long], DecayScore](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (grp, batch, state) =>
          val prev = state.getOption.getOrElse(Map.empty[Int, Long])
          val batchCounts = batch.foldLeft(Map.empty[Int, Long]) {
            case (m, (_, d)) => m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          if (batchCounts.isEmpty) Iterator.empty
          else {
            require(prev.isEmpty || batchCounts.keys.min >= prev.keys.max,
              s"decayStream($grp): day ${batchCounts.keys.min} arrived after " +
                s"later day ${prev.keys.max} — append-only day order required")
            val merged = batchCounts.foldLeft(prev) {
              case (m, (d, c)) => m.updated(d, m.getOrElse(d, 0L) + c)
            }
            val maxDay = merged.keys.max
            state.update(merged.filter { case (d, _) => d > maxDay - windowDays })
            batchCounts.keys.toSeq.sorted.iterator.map { day =>
              val fp = merged.iterator
                .filter { case (d, _) => d <= day && d > day - windowDays }
                .map { case (d, c) => c << (windowDays - (day - d)) }
                .sum
              DecayScore(grp, day, fp)
            }
          }
      }
  }

  /** One closed (gap-expired) session. */
  final case class SessionSummary(user_id: Long, n_events: Long,
                                  first_ms: Long, last_ms: Long)

  /** Expiring sessions via flatMapGroupsWithState with an EVENT-TIME
    * timeout: per-user state accumulates (count, first, last) and arms a
    * timeout at `last + gap`; when the watermark passes it, the group fires
    * with zero input rows, emits the closed session, and drops its state —
    * the state-machine shape `mapGroupsWithState` can't express (a timeout
    * firing emits 0/1 rows, not exactly one). Input must carry a watermark
    * on `ts`. Bounded state: one (3×Long) entry per OPEN session, removed
    * at close — survives any scale the keyed state store survives.
    *
    * At-least-one-summary-per-session, NOT exactly-one: the close-now path
    * below (sub-watermark straggler for an already-expired session) emits a
    * summary built from the straggler rows alone, so a session whose
    * regular timeout already fired can produce a SECOND summary with an
    * overlapping time range for the same user. Downstream consumers of the
    * append stream must either tolerate duplicate/overlapping sessions or
    * re-aggregate by (user, overlapping-range); suppressing the straggler
    * summary instead would silently DROP late rows, which is the worse
    * default for an ETL whose sink dedups on content hash anyway. */
  def expiringSessions(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                       gapMs: Long): org.apache.spark.sql.Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            val (n, first, last) = state.get
            state.remove()
            Iterator(SessionSummary(uid, n, first, last))
          } else {
            val times = rows.map(_._2.getTime).toSeq
            val (n0, f0, l0) = state.getOption.getOrElse((0L, Long.MaxValue, Long.MinValue))
            val next = (n0 + times.size, math.min(f0, times.min), math.max(l0, times.max))
            // flatMapGroupsWithState does NOT drop late rows itself: a
            // straggler for a session whose `last + gap` is already behind
            // the watermark would make setTimeoutTimestamp throw (timeouts
            // must be in the watermark's future) and fail the whole stream.
            // Such a session is by definition expired — close it now.
            val target = next._3 + gapMs
            if (target <= state.getCurrentWatermarkMs()) {
              if (state.exists) state.remove()
              Iterator(SessionSummary(uid, next._1, next._2, next._3))
            } else {
              state.update(next)
              state.setTimeoutTimestamp(target)
              Iterator.empty
            }
          }
      }
  }

  /** Drain all available source files (JSON lines with `schema`) into the
    * parquet sink at `sinkDir`, idempotently: within-batch dedup on
    * `hashCol`, then anti-join against the hashes already present. Returns
    * when the AvailableNow drain finishes.
    *
    * `mode` is the JSON parse mode: PERMISSIVE (default) nulls out
    * malformed lines; FAILFAST fails the stream on the first bad line —
    * the reference's raise-on-bad-input behavior
    * (salesforce_extractor.py:126-136). */
  def mergeAvailableNow(spark: SparkSession, srcDir: String, schema: StructType,
                        hashExprCols: Seq[String], sinkDir: String,
                        checkpoint: String, mode: String = "PERMISSIVE"): Unit = {
    val stream = spark.readStream.schema(schema).option("mode", mode).json(srcDir)
    val hashed = stream.withColumn("hash",
      Etl.contentHash(hashExprCols.map(col): _*))
    val query = hashed.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        val deduped = Etl.dedupByHash(batch, "hash", hashExprCols.take(1))
        // Only AnalysisException (sink doesn't exist yet) means "no keys";
        // a real read failure (corrupt footer, IO) must propagate — treating
        // it as empty would disable the anti-join and append duplicates,
        // the exact idempotence guarantee this operator provides.
        val existingHashes =
          try ss.read.parquet(sinkDir).select("hash").distinct()
          catch { case _: org.apache.spark.sql.AnalysisException =>
            ss.emptyDataFrame.withColumn("hash", lit("")) }
        // Materialize the existing key set BEFORE appending to the same
        // path — a lazy scan would race its own write.
        existingHashes.cache().count()
        deduped.join(existingHashes, Seq("hash"), "left_anti")
          .write.mode("append").parquet(sinkDir)
        existingHashes.unpersist()
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** Stream-stream INNER join with an event-time range condition: each
    * click joins the views of the same user at most `windowSec` seconds
    * BEFORE it (attribution). Both sides carry watermarks, and the range
    * condition bounds how long each side's rows stay in the join state —
    * without it the state store grows forever. Columns must be
    * pre-disambiguated (`view_user`/`click_user` etc.): stream-stream joins
    * can't reference ambiguous names. State per side ≈ watermark delay ×
    * arrival rate, independent of total history — the 100 TB-safe shape. */
  def clickViewJoin(views: DataFrame, clicks: DataFrame, windowSec: Long,
                    watermark: String = "1 hour"): DataFrame =
    views.withWatermark("view_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        expr(s"""view_user = click_user AND
                 |click_ts >= view_ts AND
                 |click_ts <= view_ts + INTERVAL $windowSec SECONDS""".stripMargin))

  /** Watermarked session-window aggregation (X6 streaming variant): events
    * per (user, session) with a gap-based session window — the Structured
    * Streaming analog of RelationalQueries.q22's batch sessionization.
    * `watermark = None` skips the watermark for complete-mode parity
    * harnesses (x133): the watermark's late-row filter applies even in
    * complete mode, so out-of-time-order micro-batches would silently
    * drop rows; production append-mode deployments keep the default. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: Option[String] = Some("1 hour")): DataFrame =
    watermark.foldLeft(events)((df, w) => df.withWatermark("ts", w))
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Running purchase totals emitted by [[TwsTotalsProcessor]]. */
  final case class TwsTotals(user_id: Long, n_purch: Long, cents: Long,
                             max_cents: Long)

  /** Spark-4 `transformWithState` StatefulProcessor: per-user running
    * (count, sum, max) over purchase cents held in an explicit typed
    * `ValueState`. This is the NEW arbitrary-state API (state variables +
    * TTL + timers on a RocksDB store) — the successor surface to the
    * `mapGroupsWithState` operators above; the semantics here are kept
    * deliberately re-derivable (a plain keyed aggregate) so a batch
    * oracle can gate the plumbing. */
  final class TwsTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), TwsTotals] {
    @transient private var totals:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsTotals] = {
      val (n0, s0, m0) =
        if (totals.exists()) totals.get() else (0L, 0L, 0L)
      var (n, s, m) = (n0, s0, m0)
      rows.foreach { case (_, c) =>
        n += 1; s += c; if (c > m) m = c
      }
      totals.update((n, s, m))
      Iterator.single(TwsTotals(key, n, s, m))
    }
  }

  /** `transformWithState` wrapper: input (user_id, cents) purchases →
    * per-key updated running totals each micro-batch. Requires the
    * RocksDB state-store provider (the only provider the new operator
    * supports); callers scope that conf with `QueryUtil.withConfs`. */
  def twsUserTotals(purchases: org.apache.spark.sql.Dataset[(Long, Long)]):
      org.apache.spark.sql.Dataset[TwsTotals] = {
    val spark = purchases.sparkSession
    import spark.implicits._
    purchases.groupByKey(_._1)
      .transformWithState(new TwsTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Per-(user, event_type) running count emitted by
    * [[TwsTypeCountProcessor]]. */
  final case class TwsTypeCount(user_id: Long, event_type: String, n: Long)

  /** The MAP-STATE surface of `transformWithState`: per-user running
    * counts keyed by EVENT TYPE in an explicit `MapState[String, Long]`.
    * Unlike a ValueState holding a whole map, MapState reads and writes
    * individual entries against the store — a batch touching one event
    * type for a user updates ONE RocksDB key, which is what keeps
    * per-key state mutation O(touched) when the per-user domain is wide
    * (the production shape: thousands of counters per entity, a few
    * touched per batch). Emits the updated (user, type, n) rows only for
    * types touched this batch. */
  final class TwsTypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), TwsTypeCount] {
    @transient private var counts:
        org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, String)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsTypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, et) =>
        val cur = touched.getOrElse(et,
          if (counts.containsKey(et)) counts.getValue(et) else 0L)
        touched(et) = cur + 1L
      }
      touched.foreach { case (et, n) => counts.updateValue(et, n) }
      touched.toSeq.map { case (et, n) => TwsTypeCount(key, et, n) }.iterator
    }
  }

  /** `transformWithState` wrapper over (user_id, event_type) rows →
    * per-key updated per-type running counts each micro-batch (RocksDB
    * provider required; callers scope it with `QueryUtil.withConfs`). */
  def twsTypeCounts(events: org.apache.spark.sql.Dataset[(Long, String)]):
      org.apache.spark.sql.Dataset[TwsTypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TwsTypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Per-user list-derived summary emitted by [[TwsListProcessor]]. */
  final case class TwsListSummary(user_id: Long, n: Long, cents: Long,
                                  min_cents: Long)

  /** The LIST-STATE surface of `transformWithState`: every purchase's
    * cents APPENDS to an explicit `ListState[Long]` (an O(1) store
    * append — no read-modify-write of a whole buffer, the property that
    * makes ListState the right shape for event logs), and the emitted
    * summary re-derives order-free aggregates (count, sum, min) from a
    * full list scan so a batch oracle can gate the plumbing exactly. */
  final class TwsListProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), TwsListSummary] {
    @transient private var log:
        org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      log = getHandle.getListState[Long]("log",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsListSummary] = {
      rows.foreach { case (_, c) => log.appendValue(c) }
      var (n, s, m) = (0L, 0L, Long.MaxValue)
      log.get().foreach { c => n += 1; s += c; if (c < m) m = c }
      Iterator.single(TwsListSummary(key, n, s, m))
    }
  }

  /** `transformWithState` wrapper over (user_id, cents) purchases →
    * per-key list-derived summaries each micro-batch. */
  def twsPurchaseLog(purchases: org.apache.spark.sql.Dataset[(Long, Long)]):
      org.apache.spark.sql.Dataset[TwsListSummary] = {
    val spark = purchases.sparkSession
    import spark.implicits._
    purchases.groupByKey(_._1)
      .transformWithState(new TwsListProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Warm-started running totals emitted by [[TwsWarmStartProcessor]]. */
  final case class TwsWarmTotals(user_id: Long, n: Long, cents: Long)

  /** The INITIAL-STATE surface of `transformWithState`: per-key state is
    * seeded from a BATCH dataset before the first micro-batch — the
    * warm-start/migration contract (cut a new streaming job over while
    * inheriting the totals the old batch pipeline already accumulated,
    * instead of replaying history). `handleInitialState` runs once per
    * key present in the initial-state dataset; input rows then fold on
    * top exactly as in the cold-start processor. */
  final class TwsWarmStartProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long), TwsWarmTotals, (Long, Long)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInitialState(
        key: Long, initialState: (Long, Long),
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      st.update(initialState)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsWarmTotals] = {
      var (n, s) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; s += c }
      st.update((n, s))
      Iterator.single(TwsWarmTotals(key, n, s))
    }
  }

  /** `transformWithState` with initial state: stream purchases fold on
    * top of per-user (n, cents) totals seeded from `init`. */
  def twsWarmTotals(purchases: org.apache.spark.sql.Dataset[(Long, Long)],
                    init: org.apache.spark.sql.Dataset[(Long, Long, Long)]):
      org.apache.spark.sql.Dataset[TwsWarmTotals] = {
    val spark = purchases.sparkSession
    import spark.implicits._
    purchases.groupByKey(_._1)
      .transformWithState(new TwsWarmStartProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        init.groupByKey(_._1).mapValues(r => (r._2, r._3)))
  }

  /** Per-user admission counters emitted by [[TwsTokenBucketProcessor]]. */
  final case class TwsBucketStat(user_id: Long, admitted: Long, dropped: Long)

  /** Token-bucket rate limiter as keyed streaming state — the ingestion
    * admission primitive (per-entity request caps, crawl politeness,
    * API-quota enforcement): a bucket of `capacity` tokens refills one
    * token per `refillSec` elapsed seconds; each event consumes one
    * token or is DROPPED. Refill progress is exact integer arithmetic —
    * `last` advances by whole refill periods (gain·refillSec), so
    * fractional progress carries across events with no float drift; a
    * full bucket pins `last` to the event time (no credit accrues while
    * full — the standard contract). Admission DECISIONS feed back into
    * state, so unlike x273's clamped balance there is no prefix-scan
    * closed form: the fold is inherently sequential per key, which is
    * exactly what keyed streaming state is for. Events must arrive in
    * event-time order across batches (chronological slices; any
    * file-drop/Kafka source) and are sorted (sec, event_id) within a
    * batch. */
  final class TwsTokenBucketProcessor(capacity: Long, refillSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), TwsBucketStat] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)]("bucket",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsBucketStat] = {
      val evs = rows.toArray.sortBy(r => (r._2, r._3))
      var (tok, last, adm, drp) =
        if (st.exists()) st.get() else (-1L, -1L, 0L, 0L)
      evs.foreach { case (_, sec, _) =>
        if (last < 0) { tok = capacity; last = sec }
        else {
          val gain = (sec - last) / refillSec
          if (tok + gain >= capacity) { tok = capacity; last = sec }
          else { tok += gain; last += gain * refillSec }
        }
        if (tok >= 1) { tok -= 1; adm += 1 } else drp += 1
      }
      st.update((tok, last, adm, drp))
      Iterator.single(TwsBucketStat(key, adm, drp))
    }
  }

  /** Per-day detector point emitted by [[TwsPageHinkleyProcessor]]. */
  final case class TwsPhPoint(day: Long, x: Long, m_t: Long, ph: Long)

  /** Streaming Page–Hinkley: the x341 batch detector's integer state —
    * (t, Σx, m, running-min m) — carried in ONE ValueState and folded
    * over day-census rows as they stream in. The running mean is
    * micro-quantized with truncating division exactly as the batch
    * windows compute it, so every emitted per-day PH point is
    * bit-identical to the batch trajectory (the all-BIGINT state is what
    * makes the detector replayable at all). Rows must arrive in day
    * order across batches (chronological slices) and are sorted by day
    * within a batch. */
  final class TwsPageHinkleyProcessor(deltaMicro: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), TwsPhPoint] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)]("ph",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsPhPoint] = {
      val days = rows.toArray.sortBy(_._2)
      var (t, s, m, mn) =
        if (st.exists()) st.get() else (0L, 0L, 0L, Long.MaxValue)
      val out = days.map { case (_, day, x) =>
        t += 1; s += x
        val mbar = s * 1000000L / t
        m += x * 1000000L - mbar - deltaMicro
        mn = math.min(mn, m)
        TwsPhPoint(day, x, m, m - mn)
      }
      st.update((t, s, m, mn))
      out.iterator
    }
  }

  /** `transformWithState` wrapper over (key, day, count) day-census rows
    * → per-day Page–Hinkley points. */
  def twsPageHinkley(points: org.apache.spark.sql.Dataset[(Long, Long, Long)],
                     deltaMicro: Long):
      org.apache.spark.sql.Dataset[TwsPhPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_._1)
      .transformWithState(new TwsPageHinkleyProcessor(deltaMicro),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** `transformWithState` wrapper over (user_id, sec, event_id) rows →
    * per-key running admission counters each micro-batch. */
  def twsTokenBucket(events: org.apache.spark.sql.Dataset[(Long, Long, Long)],
                     capacity: Long, refillSec: Long):
      org.apache.spark.sql.Dataset[TwsBucketStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TwsTokenBucketProcessor(capacity, refillSec),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Session summary emitted by [[TwsTimerSessionProcessor]] when its
    * event-time timer expires. */
  final case class TwsSession(user_id: Long, start_sec: Long, end_sec: Long,
                              n_events: Long)

  /** The batch-session_window merge as a pure function: existing sessions
    * plus each arrival as a singleton interval, sorted by start, coalesced
    * where the next start is within gapSec of the previous end. Extracted
    * from [[TwsTimerSessionProcessor.handleInputRows]] so the one
    * invariant that processor must uphold — folding ANY batch split of an
    * event set through this merge yields exactly the batch sessionization
    * of the whole set — is property-testable without a streaming query
    * (StreamingSpec; the r10–r12 ADVICE findings were all batch-split
    * sensitivities in this code's eager-emission predecessor). */
  private[graft] def mergeSessions(existing: Array[(Long, Long, Long)],
                                   arrivals: Array[Long],
                                   gapSec: Long): Array[(Long, Long, Long)] = {
    val all = (existing ++ arrivals.map(t => (t, t, 1L)))
      .sortBy(s => (s._1, s._2))
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    all.foreach { case (s, e, n) =>
      if (merged.nonEmpty && s - merged.last._2 <= gapSec) {
        val (ls, le, ln) = merged.last
        merged(merged.size - 1) = (ls, math.max(le, e), ln + n)
      } else merged += ((s, e, n))
    }
    merged.toArray
  }

  /** The TIMER surface of `transformWithState`: ALL of a key's unexpired
    * sessions are held in ListState; every input batch merges the new
    * events into them with batch `session_window` semantics (sort by
    * start, coalesce neighbors within gapSec) and registers an EVENT-TIME
    * timer at each session's end + gap; sessions are emitted ONLY from
    * `handleExpiredTimer` once the watermark passes their expiry.
    *
    * Earlier revisions emitted in-batch gap splits and "pending earlier"
    * sessions eagerly at end of batch — ADVICE r12 caught the hole: with
    * watermark delay > gap, a LATER micro-batch can still deliver an
    * in-watermark event inside (end, end+gap] of an eagerly-emitted
    * session that batch session_window would have merged into it,
    * fragmenting the session. Holding every session until its timer fires
    * is the only Append-mode-safe emission rule, and it makes the state
    * machine uniform: one list, one merge, one expiry condition.
    *
    * No surviving input row can extend a timer-expired session: rows past
    * the watermark filter have t ≳ wm, while an expired session has
    * end + gap < wm, so t − end > gap — input-vs-timer processing order
    * within a batch therefore cannot change the output. */
  final class TwsTimerSessionProcessor(gapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, java.sql.Timestamp), TwsSession] {
    @transient private var sessions:
        org.apache.spark.sql.streaming.ListState[(Long, Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sessions = getHandle.getListState[(Long, Long, Long)]("sessions",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsSession] = {
      // Existing sessions plus each new event as a singleton interval,
      // sorted by start, then coalesced: exactly the batch session_window
      // merge. Within-watermark out-of-order arrivals (earlier than any
      // open session, or bridging two of them) land wherever the merge
      // puts them — no eager emission, no special cases (ADVICE r10/r11/
      // r12 were all eager-emission bugs in the predecessor of this code).
      val existing = sessions.get().toArray
      val merged = IncrementalStream.mergeSessions(
        existing, rows.map(_._2).toArray, gapSec)
      sessions.put(merged)
      // One timer per session at its expiry, registered only when the
      // expiry is NEW this batch (an unchanged session's timer already
      // exists in the store — re-registering is a warn-logged no-op). An
      // extended/merged session gets a fresh timer; its superseded timers
      // fire harmlessly (the expiry check below finds nothing due).
      val had = existing.map { case (_, e, _) => e }.toSet
      merged.foreach { case (_, e, _) =>
        if (!had.contains(e)) getHandle.registerTimer((e + gapSec) * 1000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TwsSession] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs
      val all = sessions.get().toArray
      val (done, live) = all.partition { case (_, e, _) =>
        (e + gapSec) * 1000L <= expiry
      }
      if (done.nonEmpty) {
        if (live.isEmpty) sessions.clear() else sessions.put(live)
      }
      done.sortBy(_._1).iterator
        .map { case (s, e, n) => TwsSession(key, s, e, n) }
    }
  }

  /** Timer-driven sessionization over (user_id, sec) events: event-time
    * mode keyed on a `ts` column the caller derives from sec. */
  def twsTimerSessions(
      events: org.apache.spark.sql.Dataset[(Long, Long, java.sql.Timestamp)],
      gapSec: Long): org.apache.spark.sql.Dataset[TwsSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TwsTimerSessionProcessor(gapSec),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** DYNAMIC-gap session merge (r13 verdict "Next round #8"): every event
    * is its own window [t, t + gap_event]; existing sessions plus the new
    * singletons sort by start and coalesce at TOUCH (next.start <=
    * prev.end — the x318-pinned boundary), keeping max end. Sorting the
    * union each batch makes the fold batch-split invariant: a long-gap
    * event can bridge past a short-gap successor (the running-max-of-ends
    * subtlety lag-diff sessionizers get wrong), and a later bridging
    * interval re-merges previously separate sessions. Shares the
    * fixed-gap [[mergeSessions]] contract; property-tested beside it. */
  private[graft] def mergeDynSessions(existing: Array[(Long, Long, Long)],
                                      arrivals: Array[(Long, Long)]): Array[(Long, Long, Long)] = {
    val all = (existing ++ arrivals.map { case (s, e) => (s, e, 1L) })
      .sortBy(s => (s._1, s._2))
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    all.foreach { case (s, e, n) =>
      if (merged.nonEmpty && s <= merged.last._2) {
        val (ls, le, ln) = merged.last
        merged(merged.size - 1) = (ls, math.max(le, e), ln + n)
      } else merged += ((s, e, n))
    }
    merged.toArray
  }

  /** Dynamic-gap twin of [[TwsTimerSessionProcessor]] — ONE audited state
    * contract for both gap families (r13 verdict #8): all of a key's
    * unexpired sessions in ListState, merged per batch by
    * [[mergeDynSessions]], emitted ONLY from `handleExpiredTimer`. The
    * session end already includes each event's own gap (end = max of
    * t + gap_t), so the timer registers at end itself and the emission
    * boundary is the built-in dynamic `session_window`'s strict
    * `end < watermark` (x323's pinned contract). Input rows carry
    * (user, sec, gapSec, ts). */
  final class TwsDynTimerSessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, java.sql.Timestamp), TwsSession] {
    @transient private var sessions:
        org.apache.spark.sql.streaming.ListState[(Long, Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sessions = getHandle.getListState[(Long, Long, Long)]("dynsessions",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsSession] = {
      val existing = sessions.get().toArray
      val merged = IncrementalStream.mergeDynSessions(
        existing, rows.map { case (_, sec, gap, _) => (sec, sec + gap) }.toArray)
      sessions.put(merged)
      // fresh timer only for ends new this batch; superseded timers fire
      // harmlessly (the expiry partition below finds nothing due)
      val had = existing.map { case (_, e, _) => e }.toSet
      merged.foreach { case (_, e, _) =>
        if (!had.contains(e)) getHandle.registerTimer(e * 1000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TwsSession] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs
      val all = sessions.get().toArray
      val (done, live) = all.partition { case (_, e, _) => e * 1000L <= expiry }
      if (done.nonEmpty) {
        if (live.isEmpty) sessions.clear() else sessions.put(live)
      }
      done.sortBy(_._1).iterator
        .map { case (s, e, n) => TwsSession(key, s, e, n) }
    }
  }

  /** One emitted SPRT decision (see [[sprtStream]]). */
  final case class SprtDecision(event_type: String, decision: String,
                                n_at_decision: Long, llr_fp: Long)

  /** Streaming Wald SPRT (r14): per event type, ValueState carries the
    * exact fixed-point LLR walk (llr, n, decided) across micro-batches;
    * each batch folds its rows in (sec, event_id) order — with
    * chronological batch cuts the fold order is the global order, so the
    * decision point is batch-split invariant — and the decision row is
    * emitted exactly once, in the batch whose observation crosses the
    * boundary. State per key: two Longs and a flag. */
  final class SprtProcessor(stepFp: Long, boundFp: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Long, Int), SprtDecision] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Boolean)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Boolean)]("sprt",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaBoolean),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long, Long, Int)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SprtDecision] = {
      var (llr, n, decided) = if (st.exists()) st.get() else (0L, 0L, false)
      val out = scala.collection.mutable.ArrayBuffer.empty[SprtDecision]
      // in-batch order must be the global (sec, event_id) order
      rows.toArray.sortBy { case (_, id, sec, _) => (sec, id) }.foreach {
        case (_, _, _, x) =>
          if (!decided) {
            llr += (if (x == 1) stepFp else -stepFp)
            n += 1
            if (math.abs(llr) >= boundFp) {
              decided = true
              out += SprtDecision(key,
                if (llr >= boundFp) "accept_h1" else "accept_h0", n, llr)
            }
          }
      }
      st.update((llr, n, decided))
      out.iterator
    }
  }

  /** Streaming SPRT over (event_type, event_id, sec, x) rows. */
  def sprtStream(events: org.apache.spark.sql.Dataset[(String, Long, Long, Int)],
                 stepFp: Long, boundFp: Long)
      : org.apache.spark.sql.Dataset[SprtDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new SprtProcessor(stepFp, boundFp),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Timer-driven DYNAMIC-gap sessionization over (user_id, sec, gapSec)
    * events: event-time mode keyed on the caller-derived `ts` column. */
  def twsDynTimerSessions(
      events: org.apache.spark.sql.Dataset[(Long, Long, Long, java.sql.Timestamp)])
      : org.apache.spark.sql.Dataset[TwsSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TwsDynTimerSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }
}
