package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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
