package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/**
 * Vector similarity kernels over `ArrayType(FloatType)` embedding columns
 * (the `embeddings.embedding` fixture shape; SURVEY §2.3 similarity
 * search).
 *
 * Accumulation is double-precision, strictly left-to-right in array index
 * order — deterministic across partitionings and engines. Codegen is a
 * static call, so these stay inside whole-stage codegen; no UDF
 * serialization, no boxing of the float arrays (ArrayData is accessed
 * directly).
 */
object VectorOps extends Serializable {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      val diff = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += diff * diff
      i += 1
    }
    math.sqrt(acc)
  }

  private def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      val diff = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += diff * diff
      i += 1
    }
    acc
  }

  /** Index of the L2-nearest centroid; ties take the lowest index (the
    * k-means / PQ-encode assignment step — argmin over squared distance,
    * identical ordering to sqrt'd L2). */
  def argminL2(vec: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < k) {
      val d = l2sq(vec, cents.getArray(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Distance to the L2-nearest centroid (seeding's d(x, C) term). */
  def minL2(vec: ArrayData, cents: ArrayData): Double = {
    val k = cents.numElements()
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < k) {
      val d = l2sq(vec, cents.getArray(i))
      if (d < bestD) bestD = d
      i += 1
    }
    math.sqrt(bestD)
  }

  /** Index of the max-inner-product centroid; ties take the lowest index
    * (IVF corpus-side cell routing). */
  def argmaxDot(vec: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = 0
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val s = dot(vec, cents.getArray(i))
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best
  }

  /** Random-hyperplane LSH bucket: bit p set iff dot(vec, planes[p]) >= 0,
    * packed little-endian into a long (planes.length <= 63). */
  def hyperplaneBucket(vec: ArrayData, planes: ArrayData): Long = {
    val n = planes.numElements()
    // 1L << p wraps modulo 64: plane 64 would silently alias onto plane
    // 0's bit, degrading LSH recall with no error anywhere — enforce the
    // documented bound instead
    require(n <= 63, s"hyperplane_bucket supports at most 63 planes, got $n")
    var b = 0L
    var p = 0
    while (p < n) {
      if (dot(vec, planes.getArray(p)) >= 0.0) b |= 1L << p
      p += 1
    }
    b
  }

  /** Project a float vector onto the rows of a double component matrix
    * after centering: out[j] = Σ_i (vec[i] − mean[i]) · comps[j][i].
    * The PCA reduce step — one codegen'd call per corpus row, one
    * k-double allocation. */
  def pcaProject(vec: ArrayData, mean: ArrayData, comps: ArrayData): ArrayData = {
    val k = comps.numElements()
    val d = math.min(vec.numElements(), mean.numElements())
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val w = comps.getArray(j)
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += (vec.getFloat(i).toDouble - mean.getDouble(i)) * w.getDouble(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ‖vec − mean‖² with a double mean — the centered energy whose split
    * into captured + residual the PCA verdict checks. */
  def centeredNorm2(vec: ArrayData, mean: ArrayData): Double = {
    val d = math.min(vec.numElements(), mean.numElements())
    var acc = 0.0
    var i = 0
    while (i < d) {
      val t = vec.getFloat(i).toDouble - mean.getDouble(i)
      acc += t * t
      i += 1
    }
    acc
  }

  /** vec − cents[idx] (0-based), elementwise float subtraction — the
    * IVF-PQ residual projection, allocation = one primitive array. */
  def centroidResidual(vec: ArrayData, cents: ArrayData, idx: Int): ArrayData = {
    val c = cents.getArray(idx)
    val n = math.min(vec.numElements(), c.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = vec.getFloat(i) - c.getFloat(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  // The kernels read 4-byte floats out of ArrayData; without a declared
  // input type, SQL-side callers passing array(1.0, 2.0) — array<double>,
  // 8-byte slots — would silently read garbage. Declaring ArrayType(FloatType)
  // makes the analyzer insert the cast (or reject non-castable inputs).
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  protected def staticMethod: String
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val m = staticMethod
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    m match {
      case "cosine" => VectorOps.cosine(x, y)
      case "dot"    => VectorOps.dot(x, y)
      case "l2"     => VectorOps.l2(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$staticMethod($a, $b)")
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def staticMethod: String = "cosine"
  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def staticMethod: String = "dot"
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def staticMethod: String = "l2"
  override def prettyName: String = "l2_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
}

/**
 * Vector-vs-model kernels: `(array<float>, array<array<float>>) → scalar`,
 * where the right side is a broadcast model literal (centroids, codebook,
 * hyperplanes — k × dim, shipped in the plan). These are the CORPUS-side
 * assignment/bucketing steps of k-means, PQ encode, IVF cell routing and
 * LSH — the scans that dominate ANN cost at 100 TB — so they must stay
 * inside whole-stage codegen: an interpreted `zip_with`/`sort_array` HOF
 * doing the same argmin pays the per-row lambda-eval tax (~35× on the
 * minhash kernels this engine measured in round 1) and allocates k structs
 * per row where the kernel allocates nothing.
 */
abstract class VectorModelBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  protected def staticMethod: String
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    staticMethod match {
      case "argminL2"         => VectorOps.argminL2(x, y)
      case "minL2"            => VectorOps.minL2(x, y)
      case "argmaxDot"        => VectorOps.argmaxDot(x, y)
      case "hyperplaneBucket" => VectorOps.hyperplaneBucket(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$staticMethod($a, $b)")
}

/** argmin_l2(vec, cents): nearest-centroid index by L2; ties → lowest. */
case class ArgminL2(left: Expression, right: Expression) extends VectorModelBinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def staticMethod: String = "argminL2"
  override def prettyName: String = "argmin_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgminL2 =
    copy(left = l, right = r)
}

/** min_l2(vec, cents): distance to the nearest centroid. */
case class MinL2(left: Expression, right: Expression) extends VectorModelBinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def staticMethod: String = "minL2"
  override def prettyName: String = "min_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinL2 =
    copy(left = l, right = r)
}

/** argmax_dot(vec, cents): max-inner-product centroid index; ties → lowest. */
case class ArgmaxDot(left: Expression, right: Expression) extends VectorModelBinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def staticMethod: String = "argmaxDot"
  override def prettyName: String = "argmax_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgmaxDot =
    copy(left = l, right = r)
}

/** hyperplane_bucket(vec, planes): packed LSH sign-bit bucket id. */
case class HyperplaneBucket(left: Expression, right: Expression)
    extends VectorModelBinaryExpression {
  override def dataType: DataType = LongType
  override protected def staticMethod: String = "hyperplaneBucket"
  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HyperplaneBucket =
    copy(left = l, right = r)
}

/** centroid_residual(vec, cents, idx): vec − cents[idx] (0-based) →
  * array<float> — the IVF-PQ residual, codegen'd so the corpus-side
  * projection has no interpreted zip_with lambda. */
case class CentroidResidual(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)), IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def nullSafeEval(v: Any, c: Any, i: Any): Any =
    VectorOps.centroidResidual(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, i) => s"graft.functions.VectorOps.centroidResidual($v, $c, $i)")
  override def prettyName: String = "centroid_residual"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CentroidResidual =
    copy(first = f, second = s, third = t)
}

/** pca_project(vec, mean, comps): centered projections onto k double
  * component rows → array<double> — the PCA reduce step, codegen'd so
  * the corpus scan carries no interpreted lambda. */
case class PcaProject(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any, m: Any, c: Any): Any =
    VectorOps.pcaProject(
      v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, m, c) => s"graft.functions.VectorOps.pcaProject($v, $m, $c)")
  override def prettyName: String = "pca_project"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PcaProject =
    copy(first = f, second = s, third = t)
}

/** centered_norm2(vec, mean): ‖vec − mean‖² against a double mean
  * literal → double. */
case class CenteredNorm2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.centeredNorm2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.centeredNorm2($a, $b)")
  override def prettyName: String = "centered_norm2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CenteredNorm2 =
    copy(left = l, right = r)
}
