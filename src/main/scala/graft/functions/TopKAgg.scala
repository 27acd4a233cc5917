package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate (`TypedImperativeAggregate`): per group, the k
 * largest double values, descending.
 *
 * This is the scale-correct top-k-per-group: the buffer is a k-element
 * min-heap, partial aggregation keeps ≤k values per group per partition,
 * and the shuffle carries k doubles per (group, partition) — versus the
 * window-rank pattern, which shuffles and sorts EVERY row of every group
 * before discarding all but k. Merge is heap-union, so the aggregate is
 * associative/commutative and AQE/partial-agg safe.
 */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // declared input type so the analyzer CASTS a non-double numeric child
  // (int/decimal) instead of letting update()'s asInstanceOf crash at
  // runtime — the same contract every expression in this package carries
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(DoubleType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_doubles"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val vs = buf.values
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKDoubles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKDoubles =
    copy(child = c.head)
}

/** k-bounded min-heap of doubles (smallest of the kept values at root, so
  * a new value only displaces the current minimum). */
final class TopKBuffer(k: Int) {
  private val heap = new java.util.PriorityQueue[java.lang.Double](k)

  /** NaN inputs are skipped (SQL aggregate convention — MAX/MIN ignore
    * them too): java.lang.Double ordering ranks NaN above every number,
    * so an admitted NaN could never be displaced from the heap, while the
    * `peek() < v` test would never admit one past capacity — asymmetric,
    * order-dependent results. */
  def add(v: Double): Unit = {
    if (v.isNaN) return
    if (heap.size < k) heap.add(v)
    else if (heap.peek() < v) { heap.poll(); heap.add(v) }
  }

  def mergeWith(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) add(it.next())
  }

  def values: Array[Double] = {
    val out = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def sortedDesc: Array[Double] = {
    val vs = values
    java.util.Arrays.sort(vs)
    val out = new Array[Double](vs.length)
    var i = 0
    while (i < vs.length) { out(i) = vs(vs.length - 1 - i); i += 1 }
    out
  }
}
