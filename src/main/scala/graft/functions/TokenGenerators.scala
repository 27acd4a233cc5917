package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused tokenize-and-explode generators — the row expansion half of the
 * lexical contract ([[TextHash.tokenize]] / [[TextHash.tokenizeUnicode]],
 * the same byte-walk kernels minhash/shingle/text-stats already run).
 *
 * The composed formulation (`posexplode(filter(split(lower(text), re),
 * …))` and the bigram `transform`+`explode` chain in `Lm.docBigrams`)
 * pays java.util.regex per row plus interpreted higher-order-function
 * evaluation plus a materialized intermediate token array — profiled at
 * >50% of the whole LM/DSIR query family's executor CPU at sf0.1 (r19,
 * jdk.ExecutionSample: Pattern.match/UTF8String.split/ArrayFilter
 * dominate). These generators walk the lowercased UTF-8 buffer once and
 * emit token rows directly; no regex, no intermediate array, token
 * strings sliced straight from the buffer.
 *
 * Semantics are pinned IDENTICAL to the HOF forms (UnicodeTokensSpec
 * extends its three-way parity to these generators): token values,
 * order, and multiplicity match `Dedup.tokensMode(text, unicode)`
 * exactly; a NULL text yields zero rows exactly like `explode(NULL)`.
 * `CodegenFallback` is the [[BucketPairGenerator]] rationale: a
 * generator's eval runs once per input ROW (not per output row), so the
 * per-call interpretation overhead is amortized over the document's
 * whole token stream, and the inner loop is plain JVM code either way.
 */
private[graft] object TokenGen {
  val tokenSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false) // 1-based document position
    .add("tok", StringType, nullable = false)

  val bigramSchema: StructType = new StructType()
    .add("prev", StringType, nullable = false)
    .add("tok", StringType, nullable = false)
}

private[graft] abstract class TokenWalkGenerator
    extends UnaryExpression with Generator with CodegenFallback {
  def unicode: Boolean

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got $other")
  }

  /** Emit rows for token i given its (start, end) byte bounds. */
  protected def row(
      buf: Array[Byte], bounds: Array[Int], i: Int): InternalRow

  @inline protected final def tokAt(
      buf: Array[Byte], bounds: Array[Int], i: Int): UTF8String =
    UTF8String.fromBytes(buf, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i))

  override final def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) return Iterator.empty
    val (buf, bounds, nTok) =
      if (unicode) TextHash.tokenizeUnicode(text) else TextHash.tokenize(text)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < nTok
      override def next(): InternalRow = {
        val r = row(buf, bounds, i); i += 1; r
      }
    }
  }
}

/** token_rows(text): one (pos, tok) row per token, pos 1-based — the
  * fused twin of `posexplode(Dedup.tokensMode(text, unicode))`. */
case class TokenRows(child: Expression, unicode: Boolean)
    extends TokenWalkGenerator {
  override def elementSchema: StructType = TokenGen.tokenSchema
  override protected def row(
      buf: Array[Byte], bounds: Array[Int], i: Int): InternalRow =
    new GenericInternalRow(Array[Any](i + 1, tokAt(buf, bounds, i)))
  override def prettyName: String = "token_rows"
  override protected def withNewChildInternal(c: Expression): TokenRows =
    copy(child = c)
}

/** bigram_rows(text): one (prev, tok) row per token with `bos` as the
  * first row's prev — the fused twin of `Lm.docBigrams`' per-row
  * transform+explode chain. */
case class BigramRows(child: Expression, unicode: Boolean, bos: String)
    extends TokenWalkGenerator {
  override def elementSchema: StructType = TokenGen.bigramSchema
  private lazy val bosUtf8 = UTF8String.fromString(bos)
  override protected def row(
      buf: Array[Byte], bounds: Array[Int], i: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      if (i == 0) bosUtf8 else tokAt(buf, bounds, i - 1),
      tokAt(buf, bounds, i)))
  override def prettyName: String = "bigram_rows"
  override protected def withNewChildInternal(c: Expression): BigramRows =
    copy(child = c)
}

/** gram_hash_rows(text, n): one (pos, gh) row per FULL word n-gram of
  * `text` under the house lexical contract, pos 1-based (the position
  * of the gram's first token; positions past nTok − n + 1 carry no full
  * gram and emit nothing — exactly the `ngram IS NOT NULL` filter of
  * the window form). `gh` is [[TextHash.shingleHash]] over the gram's
  * token bytes joined by ' ' — collision-equivalent to the gram string
  * (two rows share `gh` iff they share the gram, up to a 64-bit hash
  * collision, the same contract the shingle-set machinery already
  * carries). The fused twin of `Ngrams.wordNgrams`' lead()-window +
  * string-concat form for consumers that use grams only as join/count
  * KEYS: no per-token window sort, no gram-string materialization, no
  * token rows through an exchange. */
case class GramHashRows(child: Expression, n: Int, unicode: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 2, s"n-gram size must be >= 2: $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got $other")
  }
  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("gh", LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) return Iterator.empty
    val (buf, bounds, nTok) =
      if (unicode) TextHash.tokenizeUnicode(text) else TextHash.tokenize(text)
    val nGrams = nTok - n + 1
    if (nGrams <= 0) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < nGrams
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](
          i + 1, TextHash.shingleHash(buf, bounds, i, i + n)))
        i += 1
        r
      }
    }
  }

  override def prettyName: String = "gram_hash_rows"
  override protected def withNewChildInternal(c: Expression): GramHashRows =
    copy(child = c)
}
