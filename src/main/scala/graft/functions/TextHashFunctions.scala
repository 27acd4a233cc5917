package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
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

  /** Tokenize raw text the way `Dedup.tokens` does (ASCII-lowercase, split
    * on non-[a-z0-9]) directly over UTF-8 bytes, returning token slices as
    * (start, end) offsets into the lowercased copy. Single allocation. */
  private[functions] def tokenize(s: UTF8String): (Array[Byte], Array[Int], Int) = {
    val src = s.getBytes
    val buf = new Array[Byte](src.length)
    // token boundaries: starts(i), ends(i) — packed into one array as pairs
    val bounds = new Array[Int](src.length + 2)
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < src.length) {
      val c = src(i)
      val lc: Byte = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      val isTok = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      buf(i) = lc
      if (isTok && !inTok) { bounds(2 * nTok) = i; inTok = true }
      if (!isTok && inTok) { bounds(2 * nTok + 1) = i; nTok += 1; inTok = false }
      i += 1
    }
    if (inTok) { bounds(2 * nTok + 1) = src.length; nTok += 1 }
    (buf, bounds, nTok)
  }

  /** Unicode-mode tokenize — the multilingual lexical contract
    * (`Dedup.tokensUnicode`): lowercase with the SAME case mapping the
    * `lower()` expression applies (`UTF8String.toLowerCase`), then
    * maximal runs of Unicode letters/marks/decimal digits
    * (`[\p{L}\p{M}\p{Nd}]` — marks keep Indic clusters like देवनागरी
    * whole), with Han/Hiragana/Katakana code points emitted as
    * SINGLE-CHARACTER tokens (scriptio continua carries no separators;
    * per-char fallback is the SentencePiece-style degradation that keeps
    * CJK near-dup/shingle semantics meaningful without a dictionary).
    * Same (lowercased UTF-8 buffer, byte-bound pairs) output shape as
    * [[tokenize]], so the shingle/minhash machinery is shared.
    * Replayable in the Java∩RE2∩DuckDB regex subset: space-pad
    * `[\p{Han}\p{Hiragana}\p{Katakana}]`, lower, split on
    * `[^\p{L}\p{M}\p{Nd}]+` (the langIdPick twin recipe). */
  private[functions] def tokenizeUnicode(s: UTF8String): (Array[Byte], Array[Int], Int) = {
    val low = s.toLowerCase.toString
    val buf = low.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bounds = new Array[Int](2 * low.length + 2)
    var nTok = 0
    var tokStart = -1
    var i = 0   // char index into low
    var off = 0 // byte offset into buf
    @inline def endTok(at: Int): Unit = if (tokStart >= 0) {
      bounds(2 * nTok) = tokStart; bounds(2 * nTok + 1) = at
      nTok += 1; tokStart = -1
    }
    while (i < low.length) {
      val cp = low.codePointAt(i)
      val nBytes =
        if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
      val script =
        if (cp >= 0x2E80) Character.UnicodeScript.of(cp) else null // all 3 scripts sit above U+2E80
      val cjk = script == Character.UnicodeScript.HAN ||
        script == Character.UnicodeScript.HIRAGANA ||
        script == Character.UnicodeScript.KATAKANA
      if (cjk) {
        endTok(off)
        bounds(2 * nTok) = off; bounds(2 * nTok + 1) = off + nBytes; nTok += 1
      } else if (Character.isLetter(cp) || Character.isDigit(cp) ||
          isCombiningMark(cp)) {
        if (tokStart < 0) tokStart = off
      } else endTok(off)
      off += nBytes
      i += Character.charCount(cp)
    }
    endTok(off)
    (buf, bounds, nTok)
  }

  /** Walk the unicode-contract WORDS of `text` (the [[tokenizeUnicode]]
    * rule: lowercase via the `lower()` case mapping, `\p{L}\p{M}\p{Nd}`
    * runs, Han/Hiragana/Katakana per-char) invoking `f` once per word
    * in order — the shared tokenize step of the BPE/unigram APPLY
    * kernels' unicode modes, so the subword encoders and the token
    * contract cannot drift. Supplementary CJK (4-byte ext planes) walks
    * correctly; inside a word the downstream Viterbi/merge encoders
    * index by Java char, so a supplementary char may segment as two
    * unk pieces — count-safe, documented. */
  def foreachUnicodeWord(text: UTF8String, f: String => Unit): Unit = {
    val s = text.toLowerCase.toString
    val word = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val script =
        if (cp >= 0x2E80) Character.UnicodeScript.of(cp) else null
      val cjk = script == Character.UnicodeScript.HAN ||
        script == Character.UnicodeScript.HIRAGANA ||
        script == Character.UnicodeScript.KATAKANA
      if (cjk) {
        if (word.length > 0) { f(word.toString); word.setLength(0) }
        f(new String(Character.toChars(cp)))
      } else if (Character.isLetter(cp) || Character.isDigit(cp) ||
          isCombiningMark(cp)) {
        word.appendCodePoint(cp)
      } else if (word.length > 0) { f(word.toString); word.setLength(0) }
      i += Character.charCount(cp)
    }
    if (word.length > 0) f(word.toString)
  }

  /** `\p{M}` (Mn | Mc | Me) — identical in Java regex and RE2. */
  @inline private[functions] def isCombiningMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** FNV-1a over the bytes of tokens [from, until) joined by ' ' — equals
    * baseHash(concat_ws(" ", tokens)) without building the string. */
  @inline private[functions] def shingleHash(
      buf: Array[Byte], bounds: Array[Int], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = from
    while (t < until) {
      if (t > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
      var i = bounds(2 * t)
      val end = bounds(2 * t + 1)
      while (i < end) {
        h ^= (buf(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      t += 1
    }
    h
  }

  /** Fused tokenize→w-shingle→k-lane minhash: one pass over the text, no
    * token/shingle string materialization. Semantically identical to
    * `minhash(shingles(tokens(text), w), k, seed)` for ASCII text (the
    * HOF path lowercases non-ASCII too, but non-alnum bytes are token
    * separators either way). This is the 100 TB hot path: the HOF chain
    * is interpreted (no codegen) and allocates ~tokens×w string bytes per
    * row; this kernel is codegen-called, allocation-free per shingle. */
  def minhashText(s: UTF8String, w: Int, k: Int, seed: Long): ArrayData =
    minhashText(s, w, k, seed, unicode = false)

  /** `unicode = true` swaps the ASCII tokenizer for [[tokenizeUnicode]] —
    * the multilingual near-dup mode; everything after tokenization
    * (shingling, lane hashing) is byte-identical machinery. */
  def minhashText(
      s: UTF8String, w: Int, k: Int, seed: Long, unicode: Boolean): ArrayData = {
    val (buf, bounds, nTok) = if (unicode) tokenizeUnicode(s) else tokenize(s)
    val laneSeed = new Array[Long](k)
    var i = 0
    while (i < k) { laneSeed(i) = mix64(seed + i); i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    val nShingles = if (nTok < w) 1 else nTok - w + 1
    var j = 0
    while (j < nShingles) {
      val base = shingleHash(buf, bounds, j, math.min(j + w, nTok))
      i = 0
      while (i < k) {
        val h = mix64(base ^ laneSeed(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Fused tokenize→w-shingle→distinct hash set, sorted ascending —
    * the set representation for exact Jaccard verification. Hashing the
    * shingles changes |A∩B|/|A∪B| only on 64-bit collisions (~2⁻⁶⁴),
    * while shrinking the shuffled set payload from shingle strings
    * (~w×word bytes each) to 8 bytes per element. */
  def shingleHashSet(s: UTF8String, w: Int): ArrayData =
    shingleHashSet(s, w, unicode = false)

  /** Unicode-tokenized variant (must match [[minhashText]]'s mode when
    * verifying its candidates — mixed-mode Jaccard is meaningless). */
  def shingleHashSet(s: UTF8String, w: Int, unicode: Boolean): ArrayData = {
    val (buf, bounds, nTok) = if (unicode) tokenizeUnicode(s) else tokenize(s)
    val nShingles = if (nTok < w) 1 else nTok - w + 1
    val hs = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      hs(j) = shingleHash(buf, bounds, j, math.min(j + w, nTok))
      j += 1
    }
    java.util.Arrays.sort(hs)
    var n = 0
    var i = 0
    while (i < nShingles) { // in-place dedup of the sorted array
      if (i == 0 || hs(i) != hs(i - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, n))
  }

  /** |A∩B| of two ascending-sorted long arrays (merge walk, O(n+m)). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** [[sortedIntersectSize]] with a Jaccard-threshold early exit: returns
    * the EXACT intersection size when J(a,b) can still reach `tau`,
    * or −1 as soon as the best-achievable intersection
    * (matched + min(remaining)) proves J < tau. For a verification stage
    * that discards sub-threshold pairs the result is equivalent, but a
    * failing pair exits after ~(1−τ/(1+τ))·min(len) mismatches instead
    * of walking both arrays — at τ = 0.9 that is ~5% of the walk, and
    * failing pairs dominate candidate sets by construction. Float
    * safety: the exit comparison `best < τ·(union_lower_bound)` can
    * never fire on a pair with true J ≥ τ — a correctly-rounded double
    * product cannot round across the representable integer `best`. */
  def sortedIntersectGe(a: ArrayData, b: ArrayData, tau: Double): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val best = n + math.min(na - i, nb - j)
        if (best.toDouble < tau * (na + nb - best).toDouble) return -1
      }
    }
    n
  }

  /** Number of positions i where a(i) == b(i) — minhash signature lane
    * agreement. The estimated-Jaccard hot kernel: runs up to maxBucket²
    * times per LSH bucket, so it must stay inside whole-stage codegen
    * (the HOF formulation `size(filter(zip_with(...)))` is interpreted
    * and allocates two arrays per pair — measured 35×-class slowdowns). */
  def laneMatchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Fused tokenize→simhash (same tokenization as [[minhashText]]). */
  def simhashText(s: UTF8String): Long = {
    val (buf, bounds, nTok) = tokenize(s)
    val counts = new Array[Int](64)
    var t = 0
    while (t < nTok) {
      val h = mix64(shingleHash(buf, bounds, t, t + 1))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Token ARRAY under the house lexical contract — the fused twin of
    * the `Dedup.tokens` / `Dedup.tokensUnicode` HOF columns (r19): one
    * byte-walk, token strings sliced from the shared lowercased buffer
    * (zero per-token copies), no java.util.regex, no interpreted
    * `filter` lambda. Values/order/multiplicity are spec-pinned
    * identical to the HOF forms (UnicodeTokensSpec). */
  def tokensArray(s: UTF8String, unicode: Boolean): ArrayData = {
    val (buf, bounds, nTok) = if (unicode) tokenizeUnicode(s) else tokenize(s)
    val arr = new Array[Any](nTok)
    var i = 0
    while (i < nTok) {
      arr(i) = UTF8String.fromBytes(buf, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i))
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Token COUNT under the house contract — `size(tokens(text))` without
    * materializing the token strings (for count-only consumers: content
    * gates, zero-token filters, length telemetry). */
  def tokenCount(s: UTF8String, unicode: Boolean): Int = {
    val (_, _, nTok) = if (unicode) tokenizeUnicode(s) else tokenize(s)
    nTok
  }

  /** Fused span-removal rebuild (r19) — the kernel form of
    * `Ngrams.removeDuplicateSpans`' per-row HOF chain:
    *
    *   kept = filter(tokens(text), (t, i) ->
    *            !exists(ivs, iv -> i+1 between iv.s0 and iv.e0))
    *   (array_join(kept, " "), size(tokens), size(kept))
    *
    * The HOF chain re-tokenized with java.util.regex and evaluated the
    * interpreted exists() lambda per (token × interval); this walks the
    * text once and sweeps the intervals sorted-by-start with a running
    * max end — O(n + k log k) and codegen-called. The keep set is
    * EXACTLY exists()'s (cover test per 1-based token position; input
    * intervals may overlap or arrive unordered — collect_list order is
    * not relied on). Returns (text_clean, n_tokens, n_kept). */
  def removeSpans(s: UTF8String, ivs: ArrayData, unicode: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (buf, bounds, nTok) = if (unicode) tokenizeUnicode(s) else tokenize(s)
    val nIvs = ivs.numElements()
    // pack (s0, e0) into one long each and sort by start. Intervals are
    // 1-based token positions by contract, but this is a public column
    // API (r19 advice): out-of-contract inputs normalize to the pinned
    // HOF exists() semantics instead of silently diverging through the
    // unsigned pack — s0 < 1 clamps to 1 (p >= 1 > s0 makes the lower
    // bound vacuous in `s0 <= p <= e0`), e0 < 1 can never cover any
    // token so the interval is dropped, and a NULL interval element
    // (possible from a hand-built array literal; the collect_list
    // producer never emits one) is skipped as a no-op.
    val packed = new Array[Long](nIvs)
    var k = 0
    var i = 0
    while (i < nIvs) {
      if (!ivs.isNullAt(i)) {
        val r = ivs.getStruct(i, 2)
        val s0 = math.max(r.getInt(0), 1)
        val e0 = r.getInt(1)
        if (e0 >= 1) {
          packed(k) = (s0.toLong << 32) | (e0.toLong & 0xffffffffL)
          k += 1
        }
      }
      i += 1
    }
    java.util.Arrays.sort(packed, 0, k)
    // sweep: token (1-based) p is covered iff some interval has
    // s0 <= p <= e0 ⇔ running max end over intervals with s0 <= p is >= p
    val kept = new Array[Boolean](nTok)
    var nKept = 0
    var outBytes = 0
    var j = 0
    var curEnd = Long.MinValue
    var p = 1
    while (p <= nTok) {
      while (j < k && (packed(j) >>> 32) <= p) {
        val e = packed(j) & 0xffffffffL
        if (e > curEnd) curEnd = e
        j += 1
      }
      if (curEnd < p) {
        kept(p - 1) = true
        nKept += 1
        outBytes += bounds(2 * (p - 1) + 1) - bounds(2 * (p - 1))
      }
      p += 1
    }
    val out = new Array[Byte](if (nKept == 0) 0 else outBytes + nKept - 1)
    var off = 0
    i = 0
    while (i < nTok) {
      if (kept(i)) {
        if (off > 0) { out(off) = ' '; off += 1 }
        val from = bounds(2 * i)
        val len = bounds(2 * i + 1) - from
        System.arraycopy(buf, from, out, off, len)
        off += len
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromBytes(out), nTok, nKept))
  }

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
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $k, ${seed}L)")
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** simhash64(tokens): array<string> → long. */
case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** minhash_text(text, w, k, seed): string → array<long> — fused
  * tokenize/shingle/minhash kernel (see [[TextHash.minhashText]]). */
case class MinHashText(
    child: Expression, w: Int, k: Int, seed: Long, unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhashText(v.asInstanceOf[UTF8String], w, k, seed, unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.minhashText($c, $w, $k, ${seed}L, $unicode)")
  override def prettyName: String = "minhash_text"
  override protected def withNewChildInternal(c: Expression): MinHashText = copy(child = c)
}

/** shingle_hash_set(text, w): string → array<long> — sorted distinct
  * w-shingle hashes (for exact Jaccard verification joins). */
case class ShingleHashSet(child: Expression, w: Int, unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHash.shingleHashSet(v.asInstanceOf[UTF8String], w, unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.shingleHashSet($c, $w, $unicode)")
  override def prettyName: String = "shingle_hash_set"
  override protected def withNewChildInternal(c: Expression): ShingleHashSet = copy(child = c)
}

/** sorted_intersect_size(a, b): two sorted array<long> → int. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHash.sortedIntersectSize($a, $b)")
  override def prettyName: String = "sorted_intersect_size"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

/** sorted_intersect_ge(a, b, tau): exact intersection size, or −1 via
  * threshold early exit once J < tau is proven (verification hot path). */
case class SortedIntersectGe(left: Expression, right: Expression, tau: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectGe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHash.sortedIntersectGe($a, $b, $tau)")
  override def prettyName: String = "sorted_intersect_ge"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectGe =
    copy(left = l, right = r)
}

/** lane_match_count(a, b): two array<long> → int (positions that agree). */
case class LaneMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.laneMatchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHash.laneMatchCount($a, $b)")
  override def prettyName: String = "lane_match_count"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LaneMatchCount =
    copy(left = l, right = r)
}

/** simhash_text(text): string → long — fused tokenize/simhash kernel. */
case class SimHashText(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhashText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhashText($c)")
  override def prettyName: String = "simhash_text"
  override protected def withNewChildInternal(c: Expression): SimHashText = copy(child = c)
}

/** doc_fingerprint(text): string → long (rolling hash, case/space-folded). */
case class DocFingerprint(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fingerprint($c)")
  override def prettyName: String = "doc_fingerprint"
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(child = c)
}

/** tokens_array(text): string → array<string> — fused twin of the
  * `Dedup.tokens`/`tokensUnicode` HOF columns (one byte-walk, no regex). */
case class TokensArray(child: Expression, unicode: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextHash.tokensArray(v.asInstanceOf[UTF8String], unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokensArray($c, $unicode)")
  override def prettyName: String = "tokens_array"
  override protected def withNewChildInternal(c: Expression): TokensArray = copy(child = c)
}

/** token_count(text): string → int — `size(tokens(text))` without
  * materializing token strings. */
case class TokenCount(child: Expression, unicode: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.tokenCount(v.asInstanceOf[UTF8String], unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenCount($c, $unicode)")
  override def prettyName: String = "token_count"
  override protected def withNewChildInternal(c: Expression): TokenCount = copy(child = c)
}

/** remove_spans(text, ivs): (string, array<struct<s0:int,e0:int>>) →
  * struct<text_clean:string, n_tokens:int, n_kept:int> — the fused
  * span-removal rebuild (see [[TextHash.removeSpans]]). */
case class RemoveSpans(left: Expression, right: Expression, unicode: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.CatalystBridge.AbstractType] =
    Seq(StringType, ArrayType(new StructType()
      .add("s0", IntegerType).add("e0", IntegerType)))
  override def dataType: DataType = new StructType()
    .add("text_clean", StringType, nullable = false)
    .add("n_tokens", IntegerType, nullable = false)
    .add("n_kept", IntegerType, nullable = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.removeSpans(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData], unicode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.removeSpans($a, $b, $unicode)")
  override def prettyName: String = "remove_spans"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RemoveSpans =
    copy(left = l, right = r)
}
