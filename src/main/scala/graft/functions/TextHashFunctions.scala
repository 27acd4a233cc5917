package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hash kernels for near-duplicate detection (SURVEY §2.3: minhash LSH and
 * simhash over document shingles).
 *
 * All hashing is a seeded 64-bit mix (splitmix64 finalizer over a
 * polynomial base hash) — pure JVM arithmetic, deterministic everywhere,
 * no dependence on Spark's partitioning. One pass over the shingle array
 * computes all k minhash lanes (k×n multiply-mix, no per-lane re-scan of
 * the text).
 */
object TextHash extends Serializable {

  /** splitmix64 finalizer — good avalanche, cheap. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a over UTF-8 bytes (stable base hash for a shingle). */
  def baseHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** k-lane minhash signature of a shingle array: lane i keeps
    * min over shingles of mix64(base ^ seed_i). */
  def minhash(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val base = baseHash(shingles.getUTF8String(j))
        var i = 0
        while (i < k) {
          val h = mix64(base ^ mix64(seed + i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit simhash of a token array: sign-aggregate each hash bit. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = mix64(baseHash(tokens.getUTF8String(j)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Polynomial rolling-hash fingerprint of whitespace-normalized text —
    * the document-fingerprint primitive (content-defined identity). */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < bytes.length) {
      val c = bytes(i)
      val isSpace = c == ' ' || c == '\n' || c == '\t' || c == '\r'
      if (isSpace) {
        pendingSpace = emitted // leading/trailing runs fold to nothing
      } else {
        if (pendingSpace) {
          h = h * 1315423911L + ' '.toLong
          pendingSpace = false
        }
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        h = h * 1315423911L + (lc & 0xffL)
        emitted = true
      }
      i += 1
    }
    mix64(h)
  }
}

/** minhash_signature(shingles, k, seed): array<string> → array<long>. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $k, ${seed}L)")
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** simhash64(tokens): array<string> → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** doc_fingerprint(text): string → long (rolling hash, case/space-folded). */
case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fingerprint($c)")
  override def prettyName: String = "doc_fingerprint"
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(child = c)
}
