package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (v, id) pairs under the total order
  * "v DESC, id ASC" (id unique → deterministic results regardless of
  * update/merge order). Kept unsorted and compacted lazily: appends are
  * O(1) and a sort-and-truncate runs only when the scratch space hits
  * 4k, giving O(n log k) amortized with tiny constants — the classic
  * bounded-selection buffer. */
final class TopKBuffer(val k: Int) {
  var vs: Array[Long] = new Array[Long](math.max(4, k * 4))
  var ids: Array[Long] = new Array[Long](math.max(4, k * 4))
  var n: Int = 0

  @inline private def better(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
    v1 > v2 || (v1 == v2 && i1 < i2)

  def add(v: Long, id: Long): Unit = {
    if (n == vs.length) compact()
    vs(n) = v; ids(n) = id; n += 1
  }

  /** Sort the scratch space by the total order and truncate to k. */
  def compact(): Unit = {
    val idx = (0 until n).sortWith((a, b) =>
      better(vs(a), ids(a), vs(b), ids(b)))
    val m = math.min(k, n)
    val nv = new Array[Long](math.max(4, k * 4))
    val ni = new Array[Long](math.max(4, k * 4))
    var j = 0
    while (j < m) { nv(j) = vs(idx(j)); ni(j) = ids(idx(j)); j += 1 }
    vs = nv; ids = ni; n = m
  }

  def mergeIn(o: TopKBuffer): Unit = {
    var j = 0
    while (j < o.n) { add(o.vs(j), o.ids(j)); j += 1 }
  }
}

/** topk_pairs(v, id, k): exact top-k (v, id) pairs as
  * array<struct<v, id>> sorted by v DESC, id ASC — a
  * TypedImperativeAggregate, so top-k runs as a real AGGREGATE with
  * map-side partial buffers instead of the window row_number() shape
  * (full shuffle of every row + per-group sort). At 100 TB the
  * difference is the whole point: each task ships at most k pairs per
  * group to the exchange, the same contract as partial sums. */
case class ExactTopK(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("v", LongType, nullable = false)
    .add("id", LongType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      b.add(v.asInstanceOf[Number].longValue(), id.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.mergeIn(o); b }

  override def eval(b: TopKBuffer): Any = {
    b.compact()
    val rows = new Array[Any](b.n)
    var j = 0
    while (j < b.n) {
      rows(j) = new GenericInternalRow(Array[Any](b.vs(j), b.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    b.compact()
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var j = 0
    while (j < b.n) { bb.putLong(b.vs(j)).putLong(b.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var j = 0
    while (j < n) { b.add(bb.getLong(), bb.getLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactTopK =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_pairs"
}
