package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused text-statistics kernels (SURVEY §2.3 text analysis — quality
 * scoring, token counting, language ID).
 *
 * The composable formulation (split → filter → aggregate / isin HOFs) is
 * INTERPRETED in Spark — every lambda is an interpreted row boundary, and
 * each metric re-allocates the token array. These kernels compute all the
 * counts in ONE pass over the UTF-8 bytes, stay inside whole-stage codegen
 * (static call), and allocate nothing per row (TextStats) or one lowercase
 * copy (LangIdPick, which must be Unicode-aware).
 *
 * Semantics are bit-identical to the HOF formulations they replace
 * (asserted in TextAnalysisSpec against the original expressions):
 *  - chars = Unicode code points (UTF-8 lead bytes)
 *  - whitespace = Java regex \s = [ \t\n\x0B\f\r] (ASCII only)
 *  - alnum tokens = maximal [a-z0-9] runs of the lowercased text
 *  - language tokens = maximal [\p{L}0-9] runs of the lowercased text
 */
object TextStatsKernel extends Serializable {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  @inline private def isStopword(
      bytes: Array[Byte], start: Int, len: Int, sws: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < sws.length) {
      val sw = sws(k)
      if (sw.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          val b = bytes(start + j)
          val lc: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          if (lc != sw(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      k += 1
    }
    false
  }

  /** One pass: (n_chars, ws_tokens, n_tokens, sum_token_len, punct_chars,
    * stopword_hits) — everything the quality/token-count operators need. */
  def statsRow(s: UTF8String, stopwords: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    var nChars = 0L; var wsToks = 0L; var nToks = 0L; var sumLen = 0L
    var alnumChars = 0L; var wsChars = 0L; var stopHits = 0L
    var inWsRun = false // inside a maximal non-whitespace run
    var tokStart = -1   // current [a-z0-9] token start
    var tokLen = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) nChars += 1 // UTF-8 lead byte = one char
      val ws = isWs(b)
      if (ws) wsChars += 1
      if (!ws && !inWsRun) wsToks += 1
      inWsRun = !ws
      val lc: Byte = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val alnum = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      if (alnum) {
        alnumChars += 1
        if (tokStart < 0) tokStart = i
        tokLen += 1
      } else if (tokStart >= 0) {
        nToks += 1; sumLen += tokLen
        if (isStopword(bytes, tokStart, tokLen, stopwords)) stopHits += 1
        tokStart = -1; tokLen = 0
      }
      i += 1
    }
    if (tokStart >= 0) {
      nToks += 1; sumLen += tokLen
      if (isStopword(bytes, tokStart, tokLen, stopwords)) stopHits += 1
    }
    // chars that match neither [a-zA-Z0-9] nor \s — non-ASCII counts here,
    // exactly like regexp_replace(text, "[a-zA-Z0-9\\s]", "") leaves it
    val punct = nChars - alnumChars - wsChars
    new GenericInternalRow(Array[Any](nChars, wsToks, nToks, sumLen, punct, stopHits))
  }

  /** Unicode-mode [[statsRow]] — the multilingual lexical contract
    * (same token rule as `TextHash.tokenizeUnicode` / `Dedup
    * .tokensUnicode`): tokens are maximal `[\p{L}\p{M}\p{Nd}]` runs of
    * the LOWERCASED text, Han/Hiragana/Katakana code points count as
    * single-character tokens. Every counter is computed over the
    * lowercased string (case mapping = `lower()`'s, so the SQL twin is
    * `lower(text)`-based): n_chars/ws_tokens are case-invariant for
    * every script without special casing, and the fixture stays clear
    * of the three context-sensitive case mappings (İ, ß, final sigma).
    * Whitespace stays the pinned ASCII class (house contract — RE2's
    * `\s` is ASCII); U+3000-style Unicode spaces count as punct in both
    * modes, documented. token chars (letters/marks/digits/CJK) are
    * excluded from punct, so CJK prose no longer reads as 100%
    * punctuation — the fix that lets the Gopher/fertility family see
    * non-Latin text at all (ASCII mode maps it to zero tokens). */
  def statsRowUnicode(s: UTF8String, stopwords: Array[Array[Byte]]): InternalRow = {
    val low = s.toLowerCase.toString
    val bytes = low.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var nChars = 0L; var wsToks = 0L; var nToks = 0L; var sumLen = 0L
    var tokChars = 0L; var wsChars = 0L; var stopHits = 0L
    var inWsRun = false
    var tokStartByte = -1
    var tokLenCp = 0L
    var i = 0   // char index
    var off = 0 // byte offset
    @inline def endTok(at: Int): Unit = if (tokStartByte >= 0) {
      nToks += 1; sumLen += tokLenCp
      if (TextStatsKernel.isStopwordBytes(bytes, tokStartByte, at - tokStartByte,
          stopwords)) stopHits += 1
      tokStartByte = -1; tokLenCp = 0L
    }
    while (i < low.length) {
      val cp = low.codePointAt(i)
      val nBytes =
        if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
      nChars += 1
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (ws) wsChars += 1
      if (!ws && !inWsRun) wsToks += 1
      inWsRun = !ws
      val script =
        if (cp >= 0x2E80) Character.UnicodeScript.of(cp) else null
      val cjk = script == Character.UnicodeScript.HAN ||
        script == Character.UnicodeScript.HIRAGANA ||
        script == Character.UnicodeScript.KATAKANA
      if (cjk) {
        endTok(off)
        nToks += 1; sumLen += 1; tokChars += 1
        // ASCII stopwords can never byte-match a >= 2-byte CJK char
      } else if (Character.isLetter(cp) || Character.isDigit(cp) ||
          TextHash.isCombiningMark(cp)) {
        tokChars += 1
        if (tokStartByte < 0) tokStartByte = off
        tokLenCp += 1
      } else endTok(off)
      off += nBytes
      i += Character.charCount(cp)
    }
    endTok(off)
    val punct = nChars - tokChars - wsChars
    new GenericInternalRow(Array[Any](nChars, wsToks, nToks, sumLen, punct, stopHits))
  }

  /** Byte-exact stopword test (tokens are already lowercased here,
    * unlike [[isStopword]]'s inline ASCII lowering). */
  private[functions] def isStopwordBytes(
      bytes: Array[Byte], start: Int, len: Int, sws: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < sws.length) {
      val sw = sws(k)
      if (sw.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) { if (bytes(start + j) != sw(j)) ok = false; j += 1 }
        if (ok) return true
      }
      k += 1
    }
    false
  }

  /** Language pick: marker-word hit count per language over [\p{L}0-9]
    * tokens of the lowercased text — with Han codepoints segmented as
    * single-character tokens (CJK fallback segmentation: Han text has no
    * separators, so a whole sentence would otherwise form ONE token that
    * can never equal a single-character marker, leaving the zh arm dead
    * on real Chinese input). Max hits wins, ties take the first
    * (alphabetically-lowest) language, zero hits → "und". The SQL twins
    * apply the identical rule by space-padding Han chars pre-split. */
  def langIdPick(s: UTF8String, model: LangIdModel): UTF8String = {
    val lower = s.toLowerCase.toString // match lower()'s Unicode case mapping
    val hits = new Array[Int](model.langs.length)
    val sb = new java.lang.StringBuilder(16)
    @inline def flush(): Unit = if (sb.length > 0) {
      val ls = model.tokenLangs.get(sb.toString)
      if (ls != null) { var k = 0; while (k < ls.length) { hits(ls(k)) += 1; k += 1 } }
      sb.setLength(0)
    }
    var i = 0
    val n = lower.length
    while (i < n) {
      val cp = lower.codePointAt(i)
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) {
        flush(); sb.appendCodePoint(cp); flush()
      } else if (Character.isLetter(cp) || (cp >= '0' && cp <= '9')) sb.appendCodePoint(cp)
      else flush()
      i += Character.charCount(cp)
    }
    flush()
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < hits.length) {
      if (hits(l) > bestHits) { bestHits = hits(l); best = l }
      l += 1
    }
    if (best < 0) LangIdModel.und else model.langs(best)
  }
}

/** Serializable marker-word model for [[TextStatsKernel.langIdPick]]:
  * langs sorted ascending (the tie-break order), token → indices of the
  * languages whose marker set contains it. */
final class LangIdModel(markers: Seq[(String, Seq[String])]) extends Serializable {
  val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient lazy val tokenLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    markers.zipWithIndex.foreach { case ((_, words), idx) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }
}

object LangIdModel {
  val und: UTF8String = UTF8String.fromString("und")
}

/** text_stats(text): string → struct of one-pass corpus statistics. */
case class TextStats(
    child: Expression, stopwords: Seq[String], unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("ws_tokens", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("punct_chars", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false)))
  @transient private lazy val stopwordBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray
  override protected def nullSafeEval(v: Any): Any =
    if (unicode) TextStatsKernel.statsRowUnicode(v.asInstanceOf[UTF8String], stopwordBytes)
    else TextStatsKernel.statsRow(v.asInstanceOf[UTF8String], stopwordBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStopwords", stopwordBytes, "byte[][]")
    val m = if (unicode) "statsRowUnicode" else "statsRow"
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.$m($c, $ref)")
  }
  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

/** lang_id_pick(text): string → string (predicted language code). */
case class LangIdPick(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StringType
  @transient private lazy val model: LangIdModel = new LangIdModel(markers)
  override protected def nullSafeEval(v: Any): Any =
    TextStatsKernel.langIdPick(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLangModel", model, classOf[LangIdModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.langIdPick($c, $ref)")
  }
  override def prettyName: String = "lang_id_pick"
  override protected def withNewChildInternal(c: Expression): LangIdPick = copy(child = c)
}
