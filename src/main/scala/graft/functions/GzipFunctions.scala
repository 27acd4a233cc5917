package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Gzip codec used by the trace pipeline.
 *
 * The reference engine decompresses each row's gzipped BLOB with an 8 KiB
 * buffered loop (reference: util/GzipUtil.java:19-31) and decodes UTF-8
 * (util/GzipUtil.java:33-35); compression for ingest lives in
 * config/DataInitializer.java:81-92. Spark has no built-in gzip scalar
 * function, so these are custom Catalyst expressions with real codegen
 * (a static-method call keeps them inside whole-stage codegen — no
 * CodegenFallback, no interpreted row boundary in the hot path).
 *
 * Static JVM methods so generated code can call them directly.
 */
object GzipCodec extends Serializable {
  private final val BufferSize = 8192

  def compress(plain: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(plain.length.max(64))
    val gz = new GZIPOutputStream(bos, BufferSize)
    try gz.write(plain)
    finally gz.close()
    bos.toByteArray
  }

  /** Throws UncheckedIOException-style RuntimeException on corrupt input —
    * the reference's fail-the-export policy
    * (service/ParquetConversionService.java:109-112).
    *
    * `maxBytes` bounds the INFLATED size: gzip ratios reach ~1000×, so at
    * corpus scale one hostile (or merely pathological) high-ratio payload
    * would otherwise balloon into an executor-killing allocation. The
    * reference never guards (util/GzipUtil.java:19-31 — it only ever
    * inflates its own trusted writes); an engine ingesting 100 TB of
    * third-party bytes must. Strict mode throws (this method); lenient
    * maps oversized, like corrupt, to null. */
  def decompress(gzipped: Array[Byte], maxBytes: Long): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(gzipped), BufferSize)
    try {
      // initial-capacity hint only (the stream grows as needed): clamp —
      // length * 3 wraps negative past ~715 MB input and a negative
      // capacity would reject a legitimately large payload with an
      // unrelated error instead of the documented maxBytes policy
      val sizeHint = math.min(gzipped.length.toLong * 3 + 64, Int.MaxValue - 8).toInt
      val out = new ByteArrayOutputStream(sizeHint)
      val buf = new Array[Byte](BufferSize)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) {
          if (out.size().toLong + n > maxBytes)
            throw new java.io.IOException(
              s"gzip output exceeds maxBytes=$maxBytes (input ${gzipped.length} bytes)")
          out.write(buf, 0, n)
        }
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  def decompress(gzipped: Array[Byte]): Array[Byte] =
    decompress(gzipped, Long.MaxValue)

  /** Lenient variant: corrupt or over-budget input → null (engine-level
    * option the reference lacks; useful for dirty data at scale). */
  def decompressOrNull(gzipped: Array[Byte], maxBytes: Long): Array[Byte] =
    try decompress(gzipped, maxBytes)
    catch { case _: java.io.IOException | _: RuntimeException => null }

  def decompressOrNull(gzipped: Array[Byte]): Array[Byte] =
    decompressOrNull(gzipped, Long.MaxValue)

  def decompressToString(gzipped: Array[Byte], maxBytes: Long): UTF8String =
    UTF8String.fromBytes(decompress(gzipped, maxBytes))

  def decompressToString(gzipped: Array[Byte]): UTF8String =
    decompressToString(gzipped, Long.MaxValue)

  def decompressToStringOrNull(gzipped: Array[Byte], maxBytes: Long): UTF8String = {
    val b = decompressOrNull(gzipped, maxBytes)
    if (b == null) null else UTF8String.fromBytes(b)
  }

  def decompressToStringOrNull(gzipped: Array[Byte]): UTF8String =
    decompressToStringOrNull(gzipped, Long.MaxValue)

  def compressString(s: UTF8String): Array[Byte] = compress(s.getBytes)
}

/** Base for the unary byte-codec expressions: null-safe, codegen via a
  * static call into [[GzipCodec]]. Declares input types so the analyzer
  * casts or rejects mismatched arguments (SQL-registered functions would
  * otherwise reach the kernels with arbitrary child types). */
abstract class GzipUnaryExpression extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(BinaryType)
  /** fully-qualified static method on GzipCodec the codegen calls */
  protected def staticMethod: String
  /** true when `staticMethod` maps corrupt input to null (failOnError=false) */
  protected def lenient: Boolean = false
  /** extra literal arguments appended to the static call (e.g. maxBytes) */
  protected def extraArgs: String = ""

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!lenient) {
      defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodec.$staticMethod($c$extraArgs)")
    } else {
      // defineCodeGen never re-checks ev.isNull after the call, so a
      // null-on-corrupt result would flow through whole-stage codegen as a
      // non-null null (NPE in the consumer). The lenient variants must set
      // isNull from the returned value explicitly.
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.GzipCodec.$staticMethod($c$extraArgs);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    }
}

/** gzip-decompress: binary → binary. failOnError=true mirrors the
  * reference's abort-on-corrupt-row semantics; `maxBytes` bounds the
  * inflated size (strict → throw, lenient → null, like corrupt input). */
case class GzipDecompress(
    child: Expression,
    failOnError: Boolean = true,
    maxBytes: Long = Long.MaxValue)
    extends GzipUnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def staticMethod: String =
    if (failOnError) "decompress" else "decompressOrNull"
  override protected def lenient: Boolean = !failOnError
  override protected def extraArgs: String = s", ${maxBytes}L"
  override def nullable: Boolean = child.nullable || !failOnError
  override protected def nullSafeEval(v: Any): Any = {
    val r =
      if (failOnError) GzipCodec.decompress(v.asInstanceOf[Array[Byte]], maxBytes)
      else GzipCodec.decompressOrNull(v.asInstanceOf[Array[Byte]], maxBytes)
    r
  }
  override def prettyName: String = "gunzip"
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(child = c)
}

/** gzip-decompress + UTF-8 decode in one expression: binary → string.
  * Fuses the reference's T1+T2 (GzipUtil.gzipDecompString). */
case class GzipDecompressToString(
    child: Expression,
    failOnError: Boolean = true,
    maxBytes: Long = Long.MaxValue)
    extends GzipUnaryExpression {
  override def dataType: DataType = StringType
  override protected def staticMethod: String =
    if (failOnError) "decompressToString" else "decompressToStringOrNull"
  override protected def lenient: Boolean = !failOnError
  override protected def extraArgs: String = s", ${maxBytes}L"
  override def nullable: Boolean = child.nullable || !failOnError
  override protected def nullSafeEval(v: Any): Any =
    if (failOnError) GzipCodec.decompressToString(v.asInstanceOf[Array[Byte]], maxBytes)
    else GzipCodec.decompressToStringOrNull(v.asInstanceOf[Array[Byte]], maxBytes)
  override def prettyName: String = "gunzip_string"
  override protected def withNewChildInternal(c: Expression): GzipDecompressToString = copy(child = c)
}

/** gzip-compress: binary → binary (ingest path, reference W1). */
case class GzipCompress(child: Expression) extends GzipUnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def staticMethod: String = "compress"
  override protected def nullSafeEval(v: Any): Any =
    GzipCodec.compress(v.asInstanceOf[Array[Byte]])
  override def prettyName: String = "gzip"
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(child = c)
}

/** gzip-compress a string column's UTF-8 bytes: string → binary. */
case class GzipCompressString(child: Expression) extends GzipUnaryExpression {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override protected def staticMethod: String = "compressString"
  override protected def nullSafeEval(v: Any): Any =
    GzipCodec.compressString(v.asInstanceOf[UTF8String])
  override def prettyName: String = "gzip_string"
  override protected def withNewChildInternal(c: Expression): GzipCompressString = copy(child = c)
}
