package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Second-moment aggregate over an `array<float>` embedding column: one
 * pass accumulates n, the per-dimension sums, and the upper triangle of
 * the cross-product matrix Σ xxᵀ — everything PCA needs to form the
 * covariance ON THE DRIVER from one d(d+3)/2-double row.
 *
 * This is the scale-correct moment pass: the buffer is O(d²) per
 * PARTITION (d=64 → ~17 KB), partial aggregation merges buffers up the
 * tree, and the corpus is touched exactly once — versus the explode
 * formulation, which shuffles d² rows PER INPUT ROW (4096× blowup at
 * d=64) to compute the same sums. Merge is elementwise addition, so the
 * aggregate is associative/commutative and partial-agg/AQE safe.
 * (Double summation order varies with partitioning — consumers treat
 * the moments as float-accurate, not bit-stable; the PCA verdict's
 * tolerances absorb this.)
 */
case class GramMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // flat layout: [d, n, sums(d), upper-triangle prods(d(d+1)/2)]
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gram_moments"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: GramBuffer): Any = new GenericArrayData(buf.flat)

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val f = buf.flat
    val bb = ByteBuffer.allocate(4 + 8 * f.length)
    bb.putInt(f.length)
    f.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val len = bb.getInt
    val f = new Array[Double](len)
    var i = 0
    while (i < len) { f(i) = bb.getDouble; i += 1 }
    GramBuffer.fromFlat(f)
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMoments =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMoments =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramMoments =
    copy(child = c.head)
}

/** Accumulator for [[GramMoments]] — dimension is latched from the first
  * vector seen; a mixed-dimension corpus fails loud, not with a silently
  * truncated covariance. */
final class GramBuffer {
  private var d: Int = -1
  private var n: Long = 0L
  private var sums: Array[Double] = _
  private var prods: Array[Double] = _

  private def init(dim: Int): Unit = {
    d = dim
    sums = new Array[Double](dim)
    prods = new Array[Double](dim * (dim + 1) / 2)
  }

  def add(a: ArrayData): Unit = {
    if (d < 0) init(a.numElements())
    require(a.numElements() == d,
      s"gram_moments: mixed embedding dims ($d vs ${a.numElements()})")
    n += 1
    var i = 0
    var t = 0
    while (i < d) {
      val xi = a.getFloat(i).toDouble
      sums(i) += xi
      var j = i
      while (j < d) {
        prods(t) += xi * a.getFloat(j).toDouble
        j += 1; t += 1
      }
      i += 1
    }
  }

  def mergeWith(other: GramBuffer): Unit = {
    if (other.d < 0) return
    if (d < 0) init(other.d)
    require(other.d == d,
      s"gram_moments merge: mixed embedding dims ($d vs ${other.d})")
    n += other.n
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
    i = 0
    while (i < prods.length) { prods(i) += other.prods(i); i += 1 }
  }

  def flat: Array[Double] = {
    if (d < 0) return Array(0.0, 0.0)
    val out = new Array[Double](2 + sums.length + prods.length)
    out(0) = d.toDouble
    out(1) = n.toDouble
    System.arraycopy(sums, 0, out, 2, sums.length)
    System.arraycopy(prods, 0, out, 2 + sums.length, prods.length)
    out
  }

  private[functions] def initFrom(dim: Int, f: Array[Double]): Unit = {
    init(dim)
    n = f(1).toLong
    System.arraycopy(f, 2, sums, 0, dim)
    System.arraycopy(f, 2 + dim, prods, 0, prods.length)
  }
}

object GramBuffer {
  def fromFlat(f: Array[Double]): GramBuffer = {
    val buf = new GramBuffer
    if (f.length <= 2) return buf // empty partition
    val d = f(0).toInt
    buf.initFrom(d, f)
    buf
  }
}
