package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe against a pre-built Bloom filter — the row-local
 * side of sketch-based semi joins (benchmark decontamination, blocklist
 * filtering). The filter itself is bounded model state carried inside
 * the expression (it ships to executors with the serialized task, the
 * same mechanism as a broadcast literal); the probe hashes the UTF-8
 * bytes directly (`mightContainBinary`), matching how
 * `DataFrameStatFunctions.bloomFilter` ingests string columns, with no
 * per-row String allocation.
 *
 * Codegen'd via a per-query reference object — the probe stays inside
 * whole-stage codegen, unlike a Scala UDF closure (which would also
 * re-box every row). One-sided error by construction: `false` is
 * definitive, `true` is "probably" with the filter's configured FPP.
 */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary(($c).getBytes())")
  }
  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
