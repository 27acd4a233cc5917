package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * UNIGRAM-LM (SentencePiece-shape) ENCODING — the apply side of
 * [[graft.operators.Unigram.trainVocab]] (Kudo, "Subword Regularization:
 * Improving Neural Network Translation Models with Multiple Subword
 * Candidates", ACL 2018). The trained vocabulary is bounded model state
 * (piece → integer micro-cost = −⌊10⁶·ln p⌉, quantized ONCE at train
 * time so every later comparison is pure integer arithmetic — the
 * [[graft.operators.Lm]] fixed-point discipline); encoding is a
 * row-local Viterbi kernel over the corpus: vocabulary broadcast inside
 * the expression via `addReferenceObj`, one codegen'd call per row, no
 * join, no UDF serialization — the same 100 TB shape as
 * [[BpeTokenCount]].
 *
 * Tokenization mirrors the training side's lexical contract
 * (`Dedup.tokens`: lowercase, split on non-[a-z0-9], drop empties), so
 * a vocabulary trained by `trainVocab` applies to exactly the words it
 * was trained on.
 *
 * Viterbi determinism: dp is an integer min-cost scan; on a total-cost
 * tie the LONGEST piece ending at the position wins (candidate start
 * indexes are visited ascending with a strict `<`), so the segmentation
 * is a pure function of (word, vocabulary) on every executor. A
 * character absent from the vocabulary falls back to a single-char
 * piece at `unkCostMicro`, so every word always segments (n_pieces ≤
 * n_chars) and no input can fail the kernel.
 */
class UnigramModel(
    val pieces: Seq[(String, Long)],
    val maxPieceLen: Int,
    val unkCostMicro: Long) extends Serializable {
  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, c) => m.putIfAbsent(p, c) }
    m
  }
  /** micro-cost of a piece, or -1 when absent from the vocabulary. */
  def cost(piece: String): Long = {
    val v = costs.get(piece)
    if (v == null) -1L else v.longValue()
  }
}

object UnigramKernel extends Serializable {

  /** Viterbi backpointers for one word: `back(i)` = start index of the
    * piece ending at position i in the min-cost segmentation of
    * word[0, i). Shared by count and segment so they cannot disagree. */
  private def viterbiBack(word: String, model: UnigramModel): Array[Int] = {
    val n = word.length
    val inf = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = inf
      var bestJ = i - 1
      // ascending j = descending piece length; strict < keeps the first
      // (longest) candidate on total-cost ties
      var j = math.max(0, i - model.maxPieceLen)
      while (j < i) {
        var c = model.cost(word.substring(j, i))
        // unknown single char: always segmentable at the unk cost
        if (c < 0 && j == i - 1) c = model.unkCostMicro
        if (c >= 0 && dp(j) < inf) {
          val tot = dp(j) + c
          if (tot < best) { best = tot; bestJ = j }
        }
        j += 1
      }
      dp(i) = best
      back(i) = bestJ
      i += 1
    }
    back
  }

  /** Number of pieces in the Viterbi segmentation of one word. */
  def encodeWordCount(word: String, model: UnigramModel): Int = {
    if (word.isEmpty) return 0
    val back = viterbiBack(word, model)
    var i = word.length
    var cnt = 0
    while (i > 0) { cnt += 1; i = back(i) }
    cnt
  }

  /** The Viterbi segmentation itself, as Catalyst array data — the
    * training E-step's expansion and the spec's hand-check surface. */
  def segmentWord(word: UTF8String, model: UnigramModel): GenericArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val back = viterbiBack(s, model)
    var i = s.length
    var cnt = 0
    while (i > 0) { cnt += 1; i = back(i) }
    val out = new Array[Any](cnt)
    i = s.length
    var k = cnt - 1
    while (i > 0) {
      out(k) = UTF8String.fromString(s.substring(back(i), i))
      k -= 1; i = back(i)
    }
    new GenericArrayData(out)
  }

  /** Total unigram token count of a text: tokenize (lowercase [a-z0-9]+
    * runs — the [[BpeKernel.tokenCount]] contract, including the
    * whole-string lowercase for 1:N Unicode case mappings), Viterbi each
    * word, sum. */
  def tokenCount(text: UTF8String, model: UnigramModel): Int =
    tokenCount(text, model, unicode = false)

  /** `unicode = true` tokenizes words through the multilingual lexical
    * contract ([[TextHash.foreachUnicodeWord]]); Viterbi per word is
    * unchanged. */
  def tokenCount(text: UTF8String, model: UnigramModel, unicode: Boolean): Int = {
    if (unicode) {
      var total = 0
      TextHash.foreachUnicodeWord(text, w => total += encodeWordCount(w, model))
      return total
    }
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    var total = 0
    val word = new java.lang.StringBuilder
    var i = 0
    while (i <= n) {
      val ch = if (i < n) s.charAt(i) else ' '
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) word.append(ch)
      else if (word.length > 0) {
        total += encodeWordCount(word.toString, model)
        word.setLength(0)
      }
      i += 1
    }
    total
  }
}

/** unigram_token_count(text): string → int — Viterbi token count under
  * a trained unigram vocabulary. */
case class UnigramTokenCount(
    child: Expression,
    pieces: Seq[(String, Long)],
    maxPieceLen: Int,
    unkCostMicro: Long,
    unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = IntegerType
  @transient private lazy val model: UnigramModel =
    new UnigramModel(pieces, maxPieceLen, unkCostMicro)
  override protected def nullSafeEval(v: Any): Any =
    UnigramKernel.tokenCount(v.asInstanceOf[UTF8String], model, unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramKernel.tokenCount($c, $ref, $unicode)")
  }
  override def prettyName: String = "unigram_token_count"
  override protected def withNewChildInternal(c: Expression): UnigramTokenCount =
    copy(child = c)
}

/** unigram_segment(word): string → array<string> — the Viterbi pieces of
  * ONE already-tokenized word (the training E-step runs this over the
  * vocabulary-sized word table, never the corpus). */
case class UnigramSegment(
    child: Expression,
    pieces: Seq[(String, Long)],
    maxPieceLen: Int,
    unkCostMicro: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val model: UnigramModel =
    new UnigramModel(pieces, maxPieceLen, unkCostMicro)
  override protected def nullSafeEval(v: Any): Any =
    UnigramKernel.segmentWord(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramKernel.segmentWord($c, $ref)")
  }
  override def prettyName: String = "unigram_segment"
  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}
