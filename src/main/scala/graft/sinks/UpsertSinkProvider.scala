package graft.sinks

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 form of the idempotent upsert sink (SURVEY.md §2 SNK1's
  * planner-integrated shape; reference behavior
  * `/root/reference/app/mysql_loader.py:197-230`: 2500-row batches, INSERT …
  * ON DUPLICATE KEY UPDATE): `df.write.format("graft-upsert")` drives the
  * full DSv2 write contract instead of a foreachPartition —
  *
  *  - **exactly-once under task retries**: writers BUFFER their batches into
  *    the commit message; nothing touches the store until the driver's
  *    `BatchWrite.commit`, which applies exactly one committed message per
  *    partition (Spark discards speculative/failed attempts), so a retried
  *    task can never double-apply;
  *  - **batched flush semantics**: rows seal into `batchsize` (default 2500)
  *    batches per partition, mirroring the reference's executemany flush
  *    cadence — the per-store flush counter is observable for specs;
  *  - **idempotent upsert**: last write per key wins within a commit
  *    (applied in partition order), re-appending the same rows is a no-op
  *    count-wise — the DB-unique-key semantics (SNK1) without a DB;
  *  - **full refresh**: `mode("overwrite")` negotiates SupportsTruncate —
  *    the store truncates inside the same commit (SNK3).
  *
  * The store is an in-memory registry keyed by the `target` option — the
  * same driver-side injection pattern as PaginatedTableProvider's clients
  * (no live DB exists in either container; the CONTRACT — schema
  * negotiation, writer lifecycle, commit/abort — is the deliverable).
  * Scale: per-partition writers stream their input; memory high-water is
  * one batch per writer plus the commit messages, and a real JDBC target
  * would apply each sealed batch in `commit` via executemany exactly like
  * `Sinks.upsertBatched`. */
class UpsertSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-upsert"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val s = UpsertSink.schemaOf(options.get("target"))
    require(s != null, "option 'target' must name a store that already exists when no schema is supplied")
    s
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UpsertTable(schema)
}

/** Driver-side in-memory upsert stores (spec-observable). */
object UpsertSink {
  final class Store(val schema: StructType) {
    /** key -> row values, in schema field order. */
    val rows = new java.util.concurrent.ConcurrentHashMap[String, Seq[Any]]()
    /** sealed-batch count across all commits — the reference's flush count. */
    val flushes = new java.util.concurrent.atomic.AtomicInteger(0)
  }
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, Store]()

  def clear(name: String): Unit = stores.remove(name)

  /** Type-tagged key normalization: a NULL key must not collide with the
    * string "null", and binary keys must compare by CONTENT (a raw
    * Array[Byte].toString is identity-based and would defeat upsert
    * idempotence — every replay would insert a fresh entry). */
  def keyOf(v: Any): String = v match {
    case null           => "null:"
    case b: Array[Byte] => "bin:" + b.map("%02x".format(_)).mkString
    case other          => "v:" + other.toString
  }
  def store(name: String): Store = {
    val s = stores.get(name)
    require(s != null, s"no upsert store '$name' — write to it first")
    s
  }
  private[sinks] def schemaOf(name: String): StructType = {
    val s = if (name == null) null else stores.get(name)
    if (s == null) null else s.schema
  }
  private[sinks] def getOrCreate(name: String, schema: StructType): Store =
    stores.computeIfAbsent(name, _ => new Store(schema))
}

private[sinks] class UpsertTable(tblSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_upsert"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new UpsertWriteBuilder(info)
}

private[sinks] class UpsertWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val opts = info.options()
      val target = opts.get("target")
      require(target != null, "option 'target' (store name) is required")
      val schema = info.schema()
      val keyCol = Option(opts.get("key")).getOrElse(schema.fieldNames.head)
      val keyIdx = schema.fieldIndex(keyCol)
      val batchSize = opts.getInt("batchsize", 2500)
      new UpsertBatchWrite(target, schema, keyIdx, batchSize, truncateFirst)
    }
  }
}

/** One sealed batch: rows as plain JVM values in schema order. */
private[sinks] case class UpsertBatch(rows: Seq[Seq[Any]])
private[sinks] case class UpsertMessage(batches: Seq[UpsertBatch]) extends WriterCommitMessage

private[sinks] class UpsertBatchWrite(target: String, schema: StructType,
                                      keyIdx: Int, batchSize: Int,
                                      truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new UpsertWriterFactory(schema, batchSize)

  /** Driver-side, once, with exactly one message per SUCCEEDED partition —
    * this is the only place the store mutates, which is what makes task
    * retries and speculative duplicates harmless. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val store = UpsertSink.getOrCreate(target, schema)
    // a second writer with a different layout must fail loudly, not mix
    // row shapes in one store behind a stale schema. Nullability is
    // deliberately ignored (a non-nullable write into a nullable store is
    // fine — and Spark frames flip nullability freely, e.g. range() vs
    // Seq.toDF), so compare (name, type) shapes.
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType.sql))
    require(shape(store.schema) == shape(schema),
      s"store '$target' has schema ${store.schema.simpleString}, write has ${schema.simpleString}")
    store.synchronized {
      if (truncateFirst) store.rows.clear()
      messages.foreach { case UpsertMessage(batches) =>
        batches.foreach { b =>
          store.flushes.incrementAndGet()
          b.rows.foreach(vals => store.rows.put(UpsertSink.keyOf(vals(keyIdx)), vals))
        }
      }
    }
  }
  /** Nothing to roll back: uncommitted data only ever lived in messages. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sinks] class UpsertWriterFactory(schema: StructType, batchSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Hoisted per-field converters (one allocation per writer, not per
      // row). Catalyst->Scala conversion DEEP-COPIES every value out of
      // Spark's internal representations — mandatory, not cosmetic: the
      // DataWriter contract reuses the InternalRow (and its Unsafe buffer)
      // across write() calls, so an un-copied UnsafeArrayData/UTF8String
      // stored in the batch would silently alias the LAST row's bytes.
      private val fieldTypes = schema.fields.map(_.dataType)
      private val toScala = fieldTypes.map(
        org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter)
      private val sealedBatches = Seq.newBuilder[UpsertBatch]
      private var buf = Seq.newBuilder[Seq[Any]]
      private var n = 0
      override def write(row: InternalRow): Unit = {
        buf += fieldTypes.indices.map(i => toScala(i)(row.get(i, fieldTypes(i)))).toSeq
        n += 1
        if (n >= batchSize) seal()
      }
      private def seal(): Unit = if (n > 0) {
        sealedBatches += UpsertBatch(buf.result())
        buf = Seq.newBuilder[Seq[Any]]
        n = 0
      }
      override def commit(): WriterCommitMessage = { seal(); UpsertMessage(sealedBatches.result()) }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
